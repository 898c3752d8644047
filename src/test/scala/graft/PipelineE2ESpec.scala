package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.{functions => F, Harmonize, Sources, StarSchema}

/** End-to-end replica of the reference pipeline (SURVEY.md §3.2, §5.2.4) on
  * mini fixtures reproducing every dirty-data quirk in FIXTURES.md: accented
  * headers, empty-string ids (na_filter=False), out-of-range numeric ids,
  * per-source score columns, unmatched fuente names. Asserts the
  * keep-everything contract: fact rows = Σ source rows, never discarded;
  * misses surface as sentinels. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private def csv(dirName: String, content: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(dirName).toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/d.csv"), content)
    Sources.csv(spark, dir)
  }

  test("full extract -> harmonize -> dims -> fact -> FK resolve") {
    // --- extract (S1, header normalization built in) ------------------
    val clients = csv("clients",
      "IdCliente,Nombre,Email\n" +
        (1 to 5).map(i => s"$i,Cliente_$i,c$i@mail.com").mkString("\n"))
    val products = csv("products",
      "IdProducto,Nombre,Categoría\n1,Prod_1,Juguetes\n2,Prod_2,Electrónica\n")
    val fuentes = csv("fuentes",
      "IdFuente,TipoFuente,FechaCarga\nF001,Web,2025-04-10\nF002,Encuesta,2025-04-11\n")
    val social = csv("social",
      "IdComment,IdCliente,IdProducto,Fuente,Fecha,Comentario\n" +
        "T0001,C019,P003,Instagram,2025-06-15,\"Información suficiente\"\n" +
        "T0002,,P006,Twitter,2025-08-27,\"Muy mala calidad\"\n")
    val surveys = csv("surveys",
      "IdOpinion,IdCliente,IdProducto,Fecha,Comentario,Clasificación,PuntajeSatisfacción,Fuente\n" +
        "1,8537,366,2025-07-15,\"El producto está bien\",Neutra,3,EncuestaInterna\n" +
        "2,42,7,2025-07-16,\"Regular\",Negativa,2,EncuestaInterna\n")
    val reviews = csv("reviews",
      "IdReview,IdCliente,IdProducto,Fecha,Comentario,Rating\n" +
        "W0001,C007,P016,2024-10-23,\"Producto llegó rápido\",4\n")

    // accented headers normalized but not de-accented (reference semantics)
    assert(products.columns.contains("categoría"))

    // --- dimensions (A1 distinct + F4 business keys) ------------------
    val dimCliente = StarSchema.buildDim(
      clients.select($"idcliente", F.businessKey("C", $"idcliente").as("bk"),
        F.normalizeText($"nombre").as("nombre")),
      Seq("bk", "nombre"), orderCol = "bk", keyName = "id_cliente")
    assert(rows(dimCliente).length == 5)
    assert(rows(dimCliente.orderBy("id_cliente")).head.getAs[String]("bk") == "C001")

    val dimFuente = fuentes
      .withColumnRenamed("idfuente", "fuente_id")
      .withColumn("nombre", $"tipofuente")  // synthesize nombre (main.py:150-151)
    assert(dimFuente.columns.contains("nombre"))

    // --- harmonize the three opinion sources (add_block) --------------
    val spec = Harmonize.Spec(Seq(
      Harmonize.Field("opinion_id", from = Seq("idcomment", "idopinion", "idreview"),
        coerce = c => F.stringOr(c)),
      Harmonize.Field("cliente_id", from = Seq("idcliente"),
        coerce = c => F.stringOr(c), default = lit("-1")),
      Harmonize.Field("producto_id", from = Seq("idproducto"),
        coerce = c => F.stringOr(c), default = lit("-1")),
      Harmonize.Field("fuente", from = Seq("fuente"), default = lit("")),
      Harmonize.Field("fecha", from = Seq("fecha"),
        coerce = c => F.parseDate(c), default = lit(null).cast("timestamp")),
      Harmonize.Field("texto_opinion", from = Seq("comentario"),
        coerce = c => F.truncateText(c, 2000), default = lit("")),
      Harmonize.Field("puntaje", from = Seq("puntajesatisfacción", "rating"),
        coerce = c => F.toDoubleOr(c, 0.0), default = lit(0.0))))
    val blocks = Seq(social, surveys, reviews).map(Harmonize(_, spec))
    val fact0 = Harmonize.unionBlocks(blocks).get

    // keep-everything: 2 + 2 + 1 source rows -> 5 fact rows
    assert(fact0.count() == 5)

    // empty IdCliente stays "" (na_filter=False), not null and not "-1"
    val socialRows = rows(fact0.filter($"opinion_id" === "T0002"))
    assert(socialRows.head.getAs[String]("cliente_id") == "")
    // missing rating column -> default 0.0; Rating/Puntaje coerced
    val byId = rows(fact0).map(r =>
      r.getAs[String]("opinion_id") -> r.getAs[Double]("puntaje")).toMap
    assert(byId("T0001") == 0.0 && byId("1") == 3.0 && byId("W0001") == 4.0)

    // --- FK resolution (J1 with sentinel on miss) ---------------------
    val resolved = StarSchema.lookupKey(fact0, dimFuente,
      dimJoin = "nombre", dimKey = "fuente_id", leftOn = "fuente",
      outCol = "fuente_id", default = "-1")
    // Instagram/Twitter/EncuestaInterna match no dim nombre -> all "-1"
    assert(rows(resolved).forall(_.getAs[String]("fuente_id") == "-1"))

    // --- modulo remap folds out-of-range ids into dim range (F7) ------
    val maxId = 5L
    // mixed id regimes ("C019" vs "8537"): ANSI cast would throw; the
    // engine's coercion contract is try_cast-null-never-fail
    val remapped = fact0
      .withColumn("cliente_num", $"cliente_id".try_cast("long"))
      .filter($"cliente_num".isNotNull)
      .withColumn("id_cliente", F.moduloRemap($"cliente_num", lit(maxId)))
    val ids = rows(remapped).map(_.getAs[Long]("id_cliente"))
    assert(ids.nonEmpty && ids.forall(k => k >= 1 && k <= maxId))
    // 8537 -> ((8537-1) % 5) + 1 = 2
    assert(rows(remapped.filter($"opinion_id" === "1"))
      .head.getAs[Long]("id_cliente") == 2L)

    // --- fecha dim over the fact dates (F5/F6) ------------------------
    val dimFecha = StarSchema.buildDimFecha(Seq($"fecha"), Seq(fact0))
    assert(dimFecha.count() == 5) // 5 distinct dates
    assert(rows(dimFecha).forall(_.getAs[Long]("fecha_key") > 20240000L))
  }

  test("config-driven extract plan: csv/sql/http keys resolve, junk degrades") {
    import graft.etl.Pipeline
    val audit = new Pipeline.Audit(sink = _ => ())
    val csvDir = java.nio.file.Files.createTempDirectory("cfg_csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$csvDir/d.csv"), "IdCliente,Nombre\n1,Ana\n2,Bo\n")
    val settings = s"""{
      |  "paths": {
      |    "clients_csv": "$csvDir",
      |    "sql_opiniones": "sql:SELECT 1 FROM t",
      |    "api_opiniones": "https://localhost:1/unreachable",
      |    "mystery": "not-a-source"
      |  },
      |  "staging_db": "ignored.sqlite"
      |}""".stripMargin
    val sources = Pipeline.sourcesFromConfig(spark, audit, settings,
      jdbcUrl = "jdbc:derby:/nonexistent/cfg_db")
    assert(sources.map(_._1) == Seq("clients_csv", "sql_opiniones", "api_opiniones"))
    assert(audit.warnings.exists(_.contains("mystery")))
    val stagingDir = java.nio.file.Files.createTempDirectory("cfg_stage").toString
    val result = Pipeline.run(spark, stagingDir, sources, builds = Nil, audit = audit)
    // the reference's observed shape: CSVs land, DB+API degrade
    assert(result.tables.keySet == Set("stg_clients"))
    assert(spark.read.parquet(result.tables("stg_clients")).count() == 2)
    assert(audit.warnings.exists(_.startsWith("sql_opiniones")))
    assert(audit.warnings.exists(w => w.startsWith("api_opiniones")))
  }

  test("orchestrator: dead + empty sources degrade, CSV blocks land, stages isolate") {
    import graft.etl.Pipeline
    val stagingDir =
      java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val audit = new Pipeline.Audit(sink = _ => ()) // silent for the test
    val clientsCsv =
      "IdCliente,Nombre\n" + (1 to 4).map(i => s"$i,Cliente_$i").mkString("\n")
    val result = Pipeline.run(spark, stagingDir,
      sources = Seq(
        // the reference's observed final run: DB dead, API dead, CSVs fine
        // (logs/etl.log:1157-1160)
        "db_opiniones" -> (() => Sources.jdbc(spark,
          "jdbc:derby:/nonexistent/db", "SELECT 1 FROM dual")),
        "api_opiniones" -> (() => Sources.jsonBody(spark, "not json at all")),
        "clients_csv" -> (() => csv("pipe_clients", clientsCsv)),
        "reviews_csv" -> (() => csv("pipe_reviews",
          "IdReview,IdCliente,Rating\nW1,1,4\nW2,2,5\nW3,9,3\n"))),
      builds = Seq(
        "dim_cliente" -> (tables => StarSchema.buildDim(
          tables("stg_clients"), Seq("idcliente", "nombre"),
          orderCol = "idcliente", keyName = "id_cliente")),
        // a broken stage: probes a table the dead source never landed
        "dim_api" -> (tables => tables("stg_api_opiniones")),
        // fact still runs after the broken stage, resolves FKs vs the dim
        "fact_opiniones" -> (tables => StarSchema.lookupKey(
          tables("stg_reviews"), tables("dim_cliente"),
          dimJoin = "idcliente", dimKey = "id_cliente",
          leftOn = "idcliente", outCol = "id_cliente", default = -1))),
      audit = audit)

    // dead + empty sources degraded with a warning each; nothing staged
    assert(audit.warnings.exists(_.startsWith("db_opiniones")))
    assert(audit.warnings.exists(_.startsWith("api_opiniones")))
    assert(!result.tables.contains("stg_db_opiniones"))
    assert(!result.tables.contains("stg_api_opiniones"))
    // CSV blocks landed with audited counts
    assert(result.tables.contains("stg_clients") && result.tables.contains("stg_reviews"))
    assert(audit.lines.contains(("INFO", "Staging -> stg_clients: 4 rows")))
    // the broken build stage warned and was skipped; the fact still built
    assert(audit.warnings.exists(_.startsWith("dim_api")))
    assert(!result.tables.contains("dim_api"))
    val fact = spark.read.parquet(result.tables("fact_opiniones"))
    assert(fact.count() == 3)
    // FK resolution: ids 1,2 hit the dim; 9 gets the sentinel
    assert(rows(fact.orderBy("idreview")).map(_.getAs[Int]("id_cliente")) ==
      Seq(1, 2, -1))
  }
}
