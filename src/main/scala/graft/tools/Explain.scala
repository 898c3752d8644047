package graft.tools

/** Dump `.explain("formatted")` for named judged queries to
  * `plans/<tag>/<name>_<suffix>.txt` — the optimization round's
  * plan-evidence artifact (guide §1: capture the plan shape — Exchange
  * count, join strategy, PushedFilters/ReadSchema — before and after
  * every change).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PLAN_DIR=plans/r16 \
  *        SPARK_GRAFT_PLAN_SUFFIX=before runMain graft.tools.Explain <query...>
  *
  * Streaming-composed queries execute their drain during construction
  * (the judged fn returns the post-drain batch frame); the dumped plan
  * covers the batch tail — still the part a plan diff can evidence.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r16")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // op-level frames (stage builds aren't SparkEntry queries; the plan
    // evidence for a touched stage names it "op:<x>" here)
    val ops: Map[String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame] = Map(
      "op:dsir" -> (s => graft.ops.TextAnalysis.dsirWeights(
        graft.queries.table(s, sfDir, "documents"),
        org.apache.spark.sql.functions.col("lang") === "en")),
      "op:spans" -> (s => graft.ops.Dedup.spanArrays(
        graft.queries.table(s, sfDir, "documents"), minLen = 25))
    )
    for (name <- args) {
      val df =
        if (ops.contains(name)) ops(name)(spark)
        else graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name.replace(':', '_')}_$suffix.txt"), plan)
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
