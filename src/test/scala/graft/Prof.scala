package graft
// Temporary dev profiler — not shipped
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.etl.{functions => F}
    val docs = graft.queries.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    // simhash phases
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(F.normalizeText(lower(col("text"))), " "))).as("tok"))
      .withColumn("h", graft.ops.Dedup.seededHash(0, col("tok")))
    time("tok+hash")(tok.write.format("noop").mode("overwrite").save())
    val voteAggs = (0 until 60).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"v$j") }
    val votes = tok.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
    time("votes agg")(votes.write.format("noop").mode("overwrite").save())
    val full = graft.ops.Dedup.simHash(docs, maxHamming = 3)
    time("simhash full cold")(full.write.format("noop").mode("overwrite").save())
    time("simhash full warm")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
