package graft

import org.apache.spark.sql.functions._
import graft.etl.{Harmonize, Sources, StarSchema}

/** Harmonizer, sources, and star-schema builders (SURVEY.md §2.1, §2.8,
  * §2.4–2.5) against reference-shaped fixtures: mixed id regimes, missing
  * columns, empty CSV cells, accented headers. */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("Harmonize: rename-if-present / default-if-absent ladder") {
    val spec = Harmonize.Spec(Seq(
      Harmonize.Field("cliente_id", from = Seq("idcliente", "cliente")),
      Harmonize.Field("puntaje", from = Seq("rating"),
        coerce = c => graft.etl.functions.toDoubleOr(c, 0.0),
        default = lit(0.0)),
      Harmonize.Field("texto", from = Seq("comentario"), default = lit(""))))
    val a = Seq(("C007", "bad", "hola")).toDF("idcliente", "rating", "comentario")
    val b = Seq(("382", 4.5)).toDF("cliente", "rating")
    val out = Harmonize.unionBlocks(Seq(a, b).map(Harmonize(_, spec))).get
    assert(out.columns.toSeq == Seq("cliente_id", "puntaje", "texto"))
    val got = rows(out.orderBy("cliente_id")).map(r =>
      (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(got == Seq(("382", 4.5, ""), ("C007", 0.0, "hola")))
  }

  test("Harmonize probe matches case-insensitively, like Spark resolution") {
    val spec = Harmonize.Spec(Seq(
      Harmonize.Field("cliente_id", from = Seq("idcliente"))))
    val got = rows(Harmonize(Seq("C1").toDF("IdCliente"), spec))
    assert(got.head.getString(0) == "C1") // renamed, not defaulted to null
  }

  test("Harmonize.unionBlocks: empty input -> None (empty-frame fallback)") {
    assert(Harmonize.unionBlocks(Nil).isEmpty)
  }

  test("S1 CSV: na_filter=false keeps empty cells as \"\", headers normalize") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/d.csv"),
      "IdCliente, Fecha Registro ,puntaje\nC007,2024-01-01,5\n,2024-01-02,3\n")
    val df = Sources.csv(spark, dir)
    assert(df.columns.toSeq == Seq("idcliente", "fecha_registro", "puntaje"))
    val got = rows(df.orderBy("fecha_registro"))
    assert(got(1).getAs[String]("idcliente") == "")   // not null
    // pandas na_filter=False per-column typing: a column WITH an empty cell
    // stays string ('' preserved); a fully-populated column still infers
    import org.apache.spark.sql.types.{IntegerType, StringType}
    assert(df.schema("idcliente").dataType == StringType)
    assert(df.schema("puntaje").dataType == IntegerType)
    assert(got.map(_.getAs[Int]("puntaje")).sorted == Seq(3, 5))
    val nulled = Sources.csv(spark, dir, naFilter = true)
    assert(rows(nulled.orderBy("fecha_registro"))(1)
      .getAs[String]("idcliente") == null)
    // File-scan budget (r6 verdict #7 + ADVICE leak): the returned frame
    // plans exactly ONE FileScan and owns no cache entry — construction's
    // probe cache must have been unpersisted before return.
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.linesIterator.count(_.contains("Scan csv")) >= 1)
    assert(!p.contains("InMemoryTableScan"), "returned plan reads a cache")
    assert(df.queryExecution.optimizedPlan.collectLeaves().size == 1,
      "naFilter=false projection must plan a single file scan")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "Sources.csv leaked a cache entry (ADVICE r6)")
  }

  test("S3 jsonBody: envelope unwrap, nested flatten, corrupt -> empty") {
    val env = Sources.jsonBody(spark,
      """{"data":[{"id":1,"u":{"name":"ana","geo":{"city":"lima"}}},
        |{"id":2,"u":{"name":"bo","geo":{"city":"oslo"}}}]}""".stripMargin)
    assert(env.columns.sorted.toSeq == Seq("id", "u_geo_city", "u_name"))
    assert(rows(env.orderBy("id")).map(_.getAs[String]("u_geo_city")) ==
      Seq("lima", "oslo"))
    val arr = Sources.jsonBody(spark, """[{"a":1},{"a":2}]""")
    assert(arr.count() == 2)
    val single = Sources.jsonBody(spark, """{"a":{"b":3}}""")
    assert(rows(single).head.getAs[Long]("a_b") == 3L)
    val scalars = Sources.jsonBody(spark, """{"data":[1,2,3]}""")
    assert(rows(scalars).map(_.getLong(0)) == Seq(1L, 2L, 3L)) // no star-expand crash
    assert(Sources.jsonBody(spark, "not json at all").isEmpty)
  }

  test("K1/K2/K4 staging writes: overwrite replaces, append adds, sorted lays out") {
    import graft.etl.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val p = s"$dir/t"
    Staging.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), p)
    assert(spark.read.parquet(p).count() == 2)
    Staging.overwrite(Seq((9L, "z")).toDF("id", "v"), p)   // replace semantics
    assert(rows(spark.read.parquet(p)).map(_.getLong(0)) == Seq(9L))
    Staging.append(Seq((10L, "y")).toDF("id", "v"), p)     // append semantics
    assert(spark.read.parquet(p).count() == 2)
    val ps = s"$dir/sorted"
    Staging.overwriteSorted(Seq(3L, 1L, 2L).toDF("k"), ps, Seq("k"))
    assert(spark.read.parquet(ps).count() == 3)
  }

  test("S2/K3 JDBC: live Derby round-trip — overwrite, batched append, query read-back") {
    import graft.etl.Staging
    System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
    val db = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val ct = Map("createTableColumnTypes" -> "v VARCHAR(16)")
    Staging.jdbcOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), url, "t", props = ct)
    // full-replace semantics: a second overwrite drops the old rows
    Staging.jdbcOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), url, "t", props = ct)
    // batched transactional append (batchsize < rows forces multiple batches)
    Staging.jdbcAppend(Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v"),
      url, "t", batchSize = 2)
    // Spark's JDBC writer creates case-sensitive (quoted) column names —
    // arbitrary SQL against them must quote too
    val back = Sources.jdbc(spark, url, """SELECT "id", "v" FROM t""")
    assert(rows(back.orderBy("id")).map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    // arbitrary SQL pushes to the RDBMS (aggregate runs Derby-side)
    val agg = Sources.jdbc(spark, url, """SELECT count(*) AS n FROM t WHERE "id" > 2""")
    assert(rows(agg).head.getAs[Number](0).longValue == 3L) // Derby COUNT -> INTEGER
  }

  test("upsert: updates replace, new keys append, untouched survive, idempotent") {
    import graft.etl.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val p = s"$dir/t"
    Staging.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), p)
    val upd = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    Staging.upsert(upd, p, key = Seq("id"))
    def state = rows(spark.read.parquet(p).orderBy("id"))
      .map(r => (r.getLong(0), r.getString(1)))
    assert(state == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    Staging.upsert(upd, p, key = Seq("id"))   // re-run: no duplicates
    assert(state == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // upsert into a missing path = plain first load
    val p2 = s"$dir/fresh"
    Staging.upsert(upd, p2, key = Seq("id"))
    assert(spark.read.parquet(p2).count() == 2)
  }

  test("buildDim: distinct + surrogate keys are 1..N in order") {
    val src = Seq((30L, "c"), (10L, "a"), (20L, "b"), (10L, "a"))
      .toDF("ck", "name")
    val dim = StarSchema.buildDim(src, Seq("ck", "name"), "ck", "id")
    val got = rows(dim.orderBy("id")).map(r => (r.getInt(0), r.getLong(1)))
    assert(got == Seq((1, 10L), (2, 20L), (3, 30L)))
  }

  test("buildDimDense: equals the row_number form, tie-breaks included") {
    // duplicate orderCol values force the tie-break columns to decide;
    // duplicate full rows must collapse via the distinct first
    val src = Seq((2L, "b"), (1L, "c"), (1L, "a"), (3L, "a"), (1L, "a"))
      .toDF("k", "v")
    val want = rows(StarSchema.buildDim(src, Seq("k", "v"), "k", "id")
      .orderBy("id")).map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    // more partitions than rows: some range partitions land empty, so the
    // offset remap must survive gaps in the partition-id sequence
    for (p <- Seq(1, 3, 8)) {
      val got = rows(StarSchema.buildDimDense(src, Seq("k", "v"), "k", "id", p)
        .orderBy("id")).map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      assert(got == want, s"partitions=$p")
    }
  }

  test("buildDimFecha: union, null-drop, distinct, calendar parts") {
    val a = Seq(Some("2024-03-05 00:00:00"), None).toDF("f")
    val b = Seq(Some("2024-03-05 00:00:00"), Some("2023-12-31 00:00:00")).toDF("f")
    val dim = StarSchema.buildDimFecha(Seq(col("f"), col("f")), Seq(a, b))
    val got = rows(dim)
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("fecha_key")) == Seq(20231231L, 20240305L))
    assert(got.last.getAs[String]("nombre_mes") == "March")
  }

  test("lookupKey: broadcast left join with sentinel on miss") {
    val fact = Seq("ana", "zoe").toDF("fuente")
    val dim = Seq(("ana", "F001")).toDF("nombre", "fuente_id")
    val out = StarSchema.lookupKey(fact, dim, dimJoin = "nombre",
      dimKey = "fuente_id", leftOn = "fuente", outCol = "fuente_id",
      default = "-1")
    val got = rows(out.orderBy("fuente")).map(_.getAs[String]("fuente_id"))
    assert(got == Seq("F001", "-1"))
  }

  test("scd2Merge: change closes+appends, no-change is a no-op, new key inserts") {
    import graft.etl.Staging
    def d(s: String) = java.sql.Date.valueOf(s)
    val history = Seq(
      (1L, "ana", 10.0, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true),
      (2L, "bob", 20.0, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true),
      // key 3 already has history: one closed + one current version
      (3L, "eva", 5.0, d("2023-01-01"), d("2024-01-01"), false),
      (3L, "eva", 7.0, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true))
      .toDF("k", "name", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "ana", 99.0),   // changed -> version
      (2L, "bob", 20.0),   // identical -> no-op
      (4L, "zoe", 1.0))    // new key -> insert
      .toDF("k", "name", "bal")
    val batch = lit(d("2024-06-01"))
    val once = Staging.scd2Merge(history, updates, Seq("k"),
      Seq("name", "bal"), batch)
    val got = rows(once.orderBy("k", "valid_from"))
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"),
        Option(r.getAs[java.sql.Date]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current")))
    assert(got == Seq(
      (1L, 10.0, Some("2024-06-01"), false),  // closed
      (1L, 99.0, None, true),                 // new version
      (2L, 20.0, None, true),                 // untouched (no-op)
      (3L, 5.0, Some("2024-01-01"), false),   // historical row passes through
      (3L, 7.0, None, true),
      (4L, 1.0, None, true)))                 // inserted
    // idempotent: merging the same batch again changes nothing
    val twice = Staging.scd2Merge(once, updates, Seq("k"),
      Seq("name", "bal"), batch)
    assert(rows(twice.orderBy("k", "valid_from")).toList ==
      rows(once.orderBy("k", "valid_from")).toList)
  }

  test("scd2Merge: updating a key with an existing closed version keeps that history") {
    import graft.etl.Staging
    def d(s: String) = java.sql.Date.valueOf(s)
    // key 3 has one closed + one current version, and THIS batch changes it
    // again — the second change must not drop the first closed row
    val history = Seq(
      (3L, "eva", 5.0, d("2023-01-01"), d("2024-01-01"), false),
      (3L, "eva", 7.0, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true))
      .toDF("k", "name", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq((3L, "eva", 9.0)).toDF("k", "name", "bal")
    val merged = Staging.scd2Merge(history, updates, Seq("k"),
      Seq("name", "bal"), lit(d("2024-06-01")))
    val got = rows(merged.orderBy("valid_from"))
      .map(r => (r.getAs[Double]("bal"),
        Option(r.getAs[java.sql.Date]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current")))
    assert(got == Seq(
      (5.0, Some("2024-01-01"), false),  // pre-existing closed version SURVIVES
      (7.0, Some("2024-06-01"), false),  // current closes
      (9.0, None, true)))                // new current
  }

  test("httpJson live: envelope parse, non-200 / wrong type / corrupt / timeout degrade") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(status: Int, contentType: String, body: String,
                delayMs: Long = 0): HttpHandler = new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (delayMs > 0) Thread.sleep(delayMs)
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", contentType)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    }
    val goodBody = """{"data":[{"id":1,"nombre":"Ana","meta":{"pais":"CL"}},
                     |        {"id":2,"nombre":"Luis","meta":{"pais":"AR"}}]}""".stripMargin
    server.createContext("/ok", handler(200, "application/json", goodBody))
    server.createContext("/err", handler(500, "application/json", goodBody))
    server.createContext("/html", handler(200, "text/html", "<html>nope</html>"))
    server.createContext("/bad", handler(200, "application/json", "{not json!!"))
    server.createContext("/slow", handler(200, "application/json", goodBody,
      delayMs = 4000))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // 200 + JSON envelope: unwrap data[], flatten meta.pais -> meta_pais,
      // normalize headers — the full api_extractor contract
      val ok = Sources.httpJson(spark, s"$base/ok",
        headers = Map("Authorization" -> "Bearer t"))
      assert(ok.columns.toSeq.sorted == Seq("id", "meta_pais", "nombre"))
      assert(rows(ok.orderBy("id")).map(_.getAs[String]("meta_pais")) ==
        Seq("CL", "AR"))
      // every failure mode degrades to an empty table, never throws
      assert(Sources.httpJson(spark, s"$base/err").isEmpty)
      assert(Sources.httpJson(spark, s"$base/html").isEmpty)
      assert(Sources.httpJson(spark, s"$base/bad").isEmpty)
      assert(Sources.httpJson(spark, s"$base/slow", timeoutSec = 1).isEmpty)
      // connection refused (nothing listens on the next port)
      assert(Sources.httpJson(spark,
        s"http://127.0.0.1:${server.getAddress.getPort + 1}/ok").isEmpty)
    } finally server.stop(0)
  }
}
