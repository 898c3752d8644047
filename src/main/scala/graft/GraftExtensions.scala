package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.bridge
import graft.functions.VectorExpressions.{FloatVecAbsMax, FloatVecDot, FloatVecQuantize, SortedDistinctStrings, SortedIntersectCount}

/** Session extension exposing the native expressions to SQL:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT float_vec_dot(a.embedding, b.embedding) FROM ...
  *
  * For an already-built session (tests, notebooks) use
  * [[GraftExtensions.register]], which installs the same builders into the
  * live function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("sorted_distinct_strings",
      new ExpressionInfo(classOf[SortedDistinctStrings].getName, "sorted_distinct_strings"),
      (args: Seq[Expression]) => SortedDistinctStrings(args(0))),
    ("float_vec_abs_max",
      new ExpressionInfo(classOf[FloatVecAbsMax].getName, "float_vec_abs_max"),
      (args: Seq[Expression]) => FloatVecAbsMax(args(0))),
    ("float_vec_quantize",
      new ExpressionInfo(classOf[FloatVecQuantize].getName, "float_vec_quantize"),
      (args: Seq[Expression]) => FloatVecQuantize(args(0))))

  /** Register into an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      bridge.registerFunction(spark, name, info, builder)
    }
}
