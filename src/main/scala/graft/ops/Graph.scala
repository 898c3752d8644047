package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph computation over edge DataFrames — the capability class
  * beyond the connected-components contraction in [[Dedup.duplicateClusters]]:
  * fixed-point scoring (PageRank here) expressed as a bounded number of
  * join + partial-aggregate rounds, never a driver-side loop over collected
  * data.
  *
  * Cross-engine determinism: per-node scores are re-quantized to 10 dp
  * after every iteration (double → DECIMAL(30,10) before the sum — the
  * dsum discipline — and a 10-dp round after), so partial-aggregation
  * order can never change a value and a SQL engine replaying the same
  * unrolled iterations lands on identical bits.
  */
object Graph {

  /** PageRank after a FIXED number of iterations over an undirected edge
    * list `(src, dst)` (each undirected pair listed once; symmetrization
    * happens here). On a duplicate-pair graph this ranks the hub documents
    * of boilerplate neighborhoods — the natural cluster representatives.
    *
    * Scale shape: each iteration is one edge ⋈ score equi-join plus one
    * partial-aggregated rollup to |nodes| rows — cost 2·|E| join rows per
    * iteration, no global structure, no driver loop state beyond the plan
    * itself. Degrees and the node count ride a one-row broadcast. A
    * convergence-driven variant would wrap the same round in the
    * duplicateClusters checkpoint discipline; fixed iterations keep the
    * result oracle-expressible (unrolled CTEs).
    */
  def pageRank(pairs: DataFrame, srcCol: String = "doc_a",
               dstCol: String = "doc_b", iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    val fwd = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    // base (teleport) mass, shared by every node each iteration
    val base = lit(1.0 - damping) / col("n_nodes")
    val init = deg.crossJoin(broadcast(n))
      .select(col("src").as("id"), col("outdeg"), col("n_nodes"),
        round(lit(1.0) / col("n_nodes"), 10).as("pr"))
    val after = (1 to iters).foldLeft(init) { (cur, _) =>
      val contrib = edges.join(cur, edges("src") === cur("id"))
        .select(col("dst"),
          (col("pr") / col("outdeg")).cast(DecimalType(30, 10)).as("c"))
      val summed = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // every node has degree >= 1 here (it came from an edge), so the
      // inner join back to the degree frame loses nobody
      cur.join(summed, cur("id") === summed("dst"))
        .select(col("id"), col("outdeg"), col("n_nodes"),
          round(base + lit(damping) * col("s").cast("double"), 10).as("pr"))
    }
    after.select(col("id").as("doc_id"), col("outdeg").as("degree"),
        col("pr").as("pagerank"))
      .orderBy(col("pagerank").desc, col("doc_id"))
  }
}
