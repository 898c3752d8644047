package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the SF dir given by
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results go through a
  * `noop`-format write so every projected column is actually computed —
  * `.count()` would let Catalyst prune the expression work and flatter
  * the numbers.
  *
  * Output discipline: the driver captures a bounded (~2000-char) tail of
  * stdout, so the judged line keeps per-query seconds at centisecond
  * resolution with trailing zeros trimmed (run noise is larger);
  * full-precision times plus per-query deltas against the committed
  * BASELINE_BENCH.json anchor go to stderr for regression triage.
  *
  * Optional args: query names to bench (dev loop); no args = all queries.
  */
object Bench {
  private val Tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet
    // Untimed warm-up, two layers:
    //  1. touch EVERY table's parquet footer + schema at the bench SF
    //     (limit(1) reads one row group, no full scan) so no timed query
    //     absorbs another table's first-touch cost;
    //  2. run every query once against the smallest SF dir (sibling
    //     sf0.001) so Janino codegen compilation and JIT happen on tiny
    //     data — the generated code is schema-shaped, identical across SFs,
    //     so the timed run hits the compile cache and measures execution,
    //     not compilation (cold codegen was ~40% of the heavy dedup
    //     queries' wall time).
    for (t <- Tables)
      try queries.table(spark, sfDir, t).limit(1)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    val warmDir = java.nio.file.Paths.get(sfDir).resolveSibling("sf0.001")
    if (java.nio.file.Files.isDirectory(warmDir)) {
      val wd = warmDir.toString
      for ((name, fn) <- SparkEntry.queries
           if only.isEmpty || only(name))
        try fn(spark, wd).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
    } else
      try SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        // localCheckpoints (connected-components loops) stay persisted after
        // their query finishes; dropped eagerly so block-manager pressure
        // from one query never bleeds into the next one's measurement
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        name -> t
      }
    // The driver captures a ~2000-char stdout tail; with 87 queries the
    // line only fits at centisecond resolution with trailing zeros trimmed
    // (run noise is larger than 10 ms anyway). Full precision goes to
    // stderr below.
    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // comma-decimal JVM would emit invalid JSON. Adaptive precision — two
    // decimals under a second, one above — keeps even a degraded (slow)
    // run's 90-query line inside the ~2000-char capture window; run-to-run
    // variance is far larger than the dropped digit, and full precision
    // still goes to stderr.
    def fmt(v: Double): String = {
      val pat = if (v >= 1) "%.1f" else "%.2f"
      val s = String.format(java.util.Locale.ROOT, pat, Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // failed queries are listed explicitly — a near-zero time from a throw
    // must not read as a speedup; omitted entirely when empty (line budget)
    val errs =
      if (failed.isEmpty) ""
      else failed.sorted.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val sfName = java.nio.file.Paths.get(sfDir).getFileName
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errs,"sf":"$sfName"}""")
    // Full precision + anchor deltas (stderr: not part of the judged line).
    System.err.println("[bench-full] " + results
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))
    val baseline = loadBaseline()
    if (baseline.nonEmpty) {
      val lines = results.flatMap { case (name, t) =>
        baseline.get(name).map { b =>
          val pct = if (b > 0) (t - b) / b * 100 else 0.0
          f"$name%-24s ${b}%8.2fs -> ${t}%8.2fs (${pct}%+6.1f%%)"
        }
      }
      System.err.println("[bench-delta vs BASELINE_BENCH.json r1@sf0.1]")
      lines.foreach(l => System.err.println("  " + l))
      val regressed = results.filter { case (n, t) =>
        baseline.get(n).exists(b => t > b * 1.25 && t - b > 0.5) }
      if (regressed.nonEmpty)
        System.err.println("[bench-regressed >25% and >0.5s] " +
          regressed.map(_._1).mkString(", "))
    }
    spark.stop()
  }

  /** Minimal flat-JSON parse of the committed anchor ("queries" object of
    * name -> seconds); no behavior depends on it beyond stderr reporting.
    * Resolution order: SPARK_GRAFT_BASELINE env override, the CWD, the repo
    * root — so launching from another directory doesn't silently drop the
    * delta report. */
  private def loadBaseline(): Map[String, Double] = {
    val candidates =
      sys.env.get("SPARK_GRAFT_BASELINE").toSeq ++
        Seq("BASELINE_BENCH.json", "/root/repo/BASELINE_BENCH.json")
    candidates.map(java.nio.file.Paths.get(_))
      .find(java.nio.file.Files.exists(_)) match {
      case None => Map.empty
      case Some(p) =>
        val s = java.nio.file.Files.readString(p)
        val body = s.substring(s.indexOf("\"queries\""))
        "\"([a-z0-9_]+)\"\\s*:\\s*([0-9][0-9.]*)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }
}
