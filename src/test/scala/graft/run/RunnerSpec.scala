package graft.run

import graft.SparkSpec
import graft.config._
import org.apache.spark.sql.Row

class RunnerSpec extends SparkSpec {

  test("e2e: CSV source → SQL stage → in-memory destination (reference integration.rs:13-52)") {
    val dir = tmpDir("runner-mem")
    val csv = writeFixtureCsv(dir)
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_mem", CsvFormat(), Location(csv.toString))),
      stages = Seq(Seq(Stage("filtered_mem",
        "SELECT id, name, value FROM raw_mem WHERE active = true ORDER BY id"))),
      destination = Some(InMemoryDestination("result_mem")))
    val out = Runner.run(spark, aq, new CollectingTracker)
    assert(out.nonEmpty)
    val rows = spark.table("result_mem").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("alpha", "gamma", "epsilon"))
    // destination stage view was deregistered after the write
    assert(!spark.catalog.tableExists("filtered_mem"))
  }

  test("e2e: no destination leaves the last stage registered (integration.rs:96-122)") {
    val dir = tmpDir("runner-nodest")
    val csv = writeFixtureCsv(dir)
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_nd", CsvFormat(), Location(csv.toString))),
      stages = Seq(Seq(Stage("summary_nd",
        "SELECT count(*) AS n, round(sum(value), 2) AS total FROM raw_nd"))))
    Runner.run(spark, aq)
    val r = spark.table("summary_nd").collect().head
    assert(r.getLong(0) == 5L && r.getDouble(1) == 151.5)
  }

  test("e2e: parquet source → filter stage → single-file CSV destination (integration.rs:54-94)") {
    val dir = tmpDir("runner-file")
    writeFixtureCsv(dir)
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir.resolve("data.csv").toString)
      .write.mode("overwrite").parquet(dir.resolve("in.parquet").toString)
    val target = dir.resolve("out").resolve("result.csv")
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_pq", ParquetFormat(), Location(dir.resolve("in.parquet").toString))),
      stages = Seq(Seq(Stage("active_rows",
        "SELECT id, name FROM raw_pq WHERE active = true ORDER BY id"))),
      destination = Some(FileDestination("result", Location(target.toString), CsvDestFormat())))
    Runner.run(spark, aq)
    assert(java.nio.file.Files.isRegularFile(target)) // exact path, not a directory
    val back = spark.read.option("header", "true").csv(target.toString).collect()
    assert(back.length == 3)
  }

  test("file destination: partitioned multi-file parquet with writer options") {
    val dir = tmpDir("runner-part")
    val csv = writeFixtureCsv(dir)
    val outDir = dir.resolve("out_part")
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_part", CsvFormat(), Location(csv.toString))),
      stages = Seq(Seq(Stage("all_rows", "SELECT * FROM raw_part"))),
      destination = Some(FileDestination("out", Location(outDir.toString),
        ParquetDestFormat(Map("compression" -> "snappy")),
        singleFile = false, partitionColumns = Seq("active"))))
    Runner.run(spark, aq)
    val sub = outDir.toFile.list().toSeq
    assert(sub.exists(_.startsWith("active=true")) && sub.exists(_.startsWith("active=false")))
    val back = spark.read.parquet(outDir.toString)
    assert(back.count() == 5)
    assert(back.columns.contains("active")) // partition column recovered
  }

  test("parallel stage groups + TTL eviction + stage chaining") {
    val dir = tmpDir("runner-groups")
    val csv = writeFixtureCsv(dir)
    val tracker = new CollectingTracker
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_g", CsvFormat(), Location(csv.toString))),
      stages = Seq(
        Seq( // concurrent group
          Stage("actives_g", "SELECT * FROM raw_g WHERE active = true"),
          Stage("inactives_g", "SELECT * FROM raw_g WHERE active = false")),
        Seq(Stage("unioned_g",
          "SELECT * FROM actives_g UNION ALL SELECT * FROM inactives_g")),
        Seq(Stage("final_g", "SELECT count(*) AS n FROM unioned_g"))),
      destination = None)
    Runner.run(spark, aq, tracker)
    assert(spark.table("final_g").collect().head.getLong(0) == 5L)
    // TTL: intermediates evicted after their last consumer group
    assert(!spark.catalog.tableExists("actives_g"))
    assert(!spark.catalog.tableExists("inactives_g"))
    assert(!spark.catalog.tableExists("unioned_g"))
    assert(spark.catalog.tableExists("final_g"))
    // progress event sequence sanity
    val evts = tracker.events
    assert(evts.contains(ProgressEvent.Started))
    assert(evts.exists { case ProgressEvent.SourceRegistered("raw_g") => true; case _ => false })
    assert(evts.count { case _: ProgressEvent.StageCompleted => true; case _ => false } == 4)
    assert(evts.exists { case _: ProgressEvent.Completed => true; case _ => false })
  }

  test("debug outputs: show (cap 500 at 0), explain, print_schema routed to tracker") {
    val dir = tmpDir("runner-debug")
    val csv = writeFixtureCsv(dir)
    val tracker = new CollectingTracker
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_dbg", CsvFormat(), Location(csv.toString))),
      stages = Seq(Seq(Stage("dbg", "SELECT id, name FROM raw_dbg ORDER BY id",
        show = Some(0), explain = true, printSchema = true))))
    Runner.run(spark, aq, tracker)
    val byType = tracker.outputs.groupBy(_._2)
    assert(byType(OutputType.Show).head._3.contains("alpha"))
    assert(byType(OutputType.Explain).head._3.contains("Physical Plan"))
    assert(byType(OutputType.PrintSchema).head._3.contains("id"))
  }

  test("JSONL source and JSON destination round-trip") {
    val dir = tmpDir("runner-jsonl")
    val jsonl = dir.resolve("in.jsonl")
    java.nio.file.Files.writeString(jsonl,
      """{"id": 1, "name": "a", "score": 1.5}
        |{"id": 2, "name": "b", "score": 2.5}
        |{"id": 3, "name": "c", "score": 3.5}
        |""".stripMargin)
    val out = dir.resolve("out.jsonl")
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_jl", JsonFormat(), Location(jsonl.toString))),
      stages = Seq(Seq(Stage("jl_sel", "SELECT id, name FROM raw_jl WHERE score > 2 ORDER BY id"))),
      destination = Some(FileDestination("jl_out", Location(out.toString), JsonDestFormat)))
    Runner.run(spark, aq)
    val back = spark.read.json(out.toString)
    assert(back.count() == 2)
    assert(back.select("name").collect().map(_.getString(0)).sorted.toSeq == Seq("b", "c"))
  }

  test("ORC source and partitioned ORC destination round-trip (beyond reference)") {
    val dir = tmpDir("runner-orc")
    val in = dir.resolve("in.orc")
    spark.range(1, 21)
      .selectExpr("id", "concat('n', id) AS name",
        "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS parity",
        "CAST(id AS DOUBLE) * 1.5 AS score")
      .coalesce(1).write.mode("overwrite").orc(in.toString)
    val out = dir.resolve("out")
    Runner.run(spark, Aqueduct(
      sources = Seq(FileSource("raw_orc", OrcFormat(), Location(in.toString))),
      stages = Seq(Seq(Stage("orc_sel",
        "SELECT id, name, parity, score FROM raw_orc WHERE id <= 10"))),
      destination = Some(FileDestination("orc_out", Location(out.toString),
        OrcDestFormat(Map("compression" -> "zlib")),
        singleFile = false, partitionColumns = Seq("parity")))))
    // hive layout on disk, lossless read-back through a typed directory source
    assert(java.nio.file.Files.isDirectory(out.resolve("parity=even")))
    Runner.run(spark, Aqueduct(
      sources = Seq(DirSource("orc_dir", OrcFormat(), Location(out.toString),
        partitionColumns = Seq("parity" -> org.apache.spark.sql.types.StringType))),
      stages = Seq(Seq(Stage("orc_back",
        "SELECT parity, count(*) AS n, round(sum(score), 2) AS total FROM orc_dir GROUP BY parity")))))
    val rows = spark.table("orc_back").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("even", 5L, 45.0), ("odd", 5L, 37.5)))
    spark.catalog.dropTempView("orc_back")
  }

  test("Avro source and destination round-trip, incl. single_file and partitions (beyond reference)") {
    val dir = tmpDir("runner-avro")
    val in = dir.resolve("in")
    graft.sources.Avro.write(
      spark.range(1, 21).selectExpr("id", "concat('n', id) AS name",
        "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS parity",
        "CAST(id AS DOUBLE) * 1.5 AS score"),
      in.toString)
    // avro source → stage → single exact-path avro file
    val single = dir.resolve("out.avro")
    Runner.run(spark, Aqueduct(
      sources = Seq(FileSource("raw_av", AvroFormat(), Location(in.toString))),
      stages = Seq(Seq(Stage("av_sel",
        "SELECT id, name, parity, score FROM raw_av WHERE id <= 10"))),
      destination = Some(FileDestination("av_out", Location(single.toString),
        AvroDestFormat(codec = Some("deflate"))))))
    assert(java.nio.file.Files.isRegularFile(single))
    // hive-partitioned avro write; partition dirs on disk
    val parts = dir.resolve("parts")
    Runner.run(spark, Aqueduct(
      sources = Seq(FileSource("raw_av2", AvroFormat(), Location(single.toString))),
      stages = Seq(Seq(Stage("av_all", "SELECT * FROM raw_av2"))),
      destination = Some(FileDestination("av_parts", Location(parts.toString),
        AvroDestFormat(), singleFile = false, partitionColumns = Seq("parity")))))
    assert(java.nio.file.Files.isDirectory(parts.resolve("parity=even")))
    val back = graft.sources.Avro.read(spark, parts.resolve("parity=odd").toString)
    assert(back.count() == 5 &&
      back.selectExpr("sum(id)").head().getLong(0) == (1 + 3 + 5 + 7 + 9))
  }

  test("managed-table source with time travel through the config pipeline") {
    val dir = tmpDir("runner-mtsrc")
    val tblLoc = Location(dir.resolve("tbl").toString)
    import org.apache.spark.sql.types._
    graft.destinations.ManagedTable.createIfAbsent(spark, tblLoc,
      Seq(graft.config.Types.FieldSpec("id", LongType), graft.config.Types.FieldSpec("v", StringType)),
      Nil, Map.empty)
    import spark.implicits._
    graft.destinations.ManagedTable.append(spark, tblLoc, Seq((1L, "a")).toDF("id", "v"))
    graft.destinations.ManagedTable.append(spark, tblLoc, Seq((2L, "b")).toDF("id", "v"))
    // latest
    val latest = Aqueduct(
      sources = Seq(ManagedTableSource("mt_latest", tblLoc)),
      stages = Seq(Seq(Stage("mt_n", "SELECT count(*) AS n FROM mt_latest"))))
    Runner.run(spark, latest)
    assert(spark.table("mt_n").head().getLong(0) == 2L)
    // version 1 (after first append) via config `version`
    val v1 = Aqueduct(
      sources = Seq(ManagedTableSource("mt_v1", tblLoc, version = Some(1))),
      stages = Seq(Seq(Stage("mt_n1", "SELECT count(*) AS n FROM mt_v1"))))
    Runner.run(spark, v1)
    assert(spark.table("mt_n1").head().getLong(0) == 1L)
  }

  test("explain_analyze emits an executed plan with metrics") {
    val dir = tmpDir("runner-ea")
    val csv = writeFixtureCsv(dir)
    val tracker = new CollectingTracker
    val aq = Aqueduct(
      sources = Seq(FileSource("raw_ea", CsvFormat(), Location(csv.toString))),
      stages = Seq(Seq(Stage("ea_stage", "SELECT count(*) AS n FROM raw_ea",
        explainAnalyze = true))))
    Runner.run(spark, aq, tracker)
    val body = tracker.outputs.find(_._2 == OutputType.ExplainAnalyze).get._3
    assert(body.contains("HashAggregate") || body.contains("AdaptiveSparkPlan"), body)
  }

  test("directory source with typed hive partitions") {
    val dir = tmpDir("runner-dir")
    import spark.implicits._
    Seq((1, "a", "2024"), (2, "b", "2024"), (3, "c", "2025"))
      .toDF("id", "v", "year")
      .write.partitionBy("year").mode("overwrite")
      .parquet(dir.resolve("data").toString)
    val aq = Aqueduct(
      sources = Seq(DirSource("dirsrc", ParquetFormat(), Location(dir.resolve("data").toString),
        partitionColumns = Seq(("year", org.apache.spark.sql.types.IntegerType)))),
      stages = Seq(Seq(Stage("by_year",
        "SELECT year, count(*) AS n FROM dirsrc GROUP BY year ORDER BY year"))))
    Runner.run(spark, aq)
    val rows = spark.table("by_year").collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((2024, 2L), (2025, 1L)))
  }

  test("validation: DDL/DML rejected at load time, before anything runs") {
    val aq = Aqueduct(
      sources = Nil,
      stages = Seq(Seq(Stage("bad", "DROP TABLE raw"))))
    assertThrows[SqlGuard.SqlValidationError](Runner.run(spark, aq))
    Seq("CREATE TABLE t (a INT)", "INSERT INTO t VALUES (1)", "SET spark.foo=1",
      "DELETE FROM t WHERE a = 1", "UPDATE t SET a = 2").foreach { q =>
      assertThrows[SqlGuard.SqlValidationError](SqlGuard.validate(spark, "s", q))
    }
    // pure queries pass, including CTEs and VALUES
    SqlGuard.validate(spark, "s", "WITH x AS (SELECT 1 AS a) SELECT * FROM x")
    SqlGuard.validate(spark, "s", "SELECT * FROM VALUES (1, 'a') AS t(id, name)")
    // syntax error carries position info
    val e = intercept[SqlGuard.SqlValidationError](SqlGuard.validate(spark, "s", "SELEC 1"))
    assert(e.getMessage.contains("s"))
  }

  test("stage failures carry the stage name; missing tables fail cleanly") {
    val aq = Aqueduct(
      stages = Seq(Seq(Stage("boom_stage", "SELECT * FROM table_that_does_not_exist_xyz"))))
    val e = intercept[Runner.PipelineError](Runner.run(spark, aq))
    assert(e.getMessage.contains("boom_stage"))

    // a missing file source location fails at registration, not mid-query
    val aq2 = Aqueduct(
      sources = Seq(FileSource("no_such", ParquetFormat(), Location("/tmp/definitely/missing.parquet"))),
      stages = Seq(Seq(Stage("s_ns", "SELECT 1"))))
    assertThrows[Exception](Runner.run(spark, aq2))
  }

  test("duplicate stage names rejected") {
    val aq = Aqueduct(stages = Seq(
      Seq(Stage("dup", "SELECT 1")), Seq(Stage("dup", "SELECT 2"))))
    assertThrows[Runner.PipelineError](Runner.run(spark, aq))
  }

  test("in-memory source must pre-exist") {
    val aq = Aqueduct(
      sources = Seq(InMemorySource("never_registered_xyz")),
      stages = Seq(Seq(Stage("s_mem", "SELECT * FROM never_registered_xyz"))))
    assertThrows[Exception](Runner.run(spark, aq))

    import spark.implicits._
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("pre_registered")
    val ok = Aqueduct(
      sources = Seq(InMemorySource("pre_registered")),
      stages = Seq(Seq(Stage("s_mem2", "SELECT count(*) AS n FROM pre_registered"))))
    Runner.run(spark, ok)
    assert(spark.table("s_mem2").collect().head.getLong(0) == 1L)
  }

  test("in_memory destination name colliding with a stage fails at validate time") {
    val dir = tmpDir("runner-dest-collide")
    val csv = writeFixtureCsv(dir)
    val aq = Aqueduct(
      sources = Seq(FileSource("dc_src", CsvFormat(hasHeader = true), Location(csv.toString))),
      stages = Seq(Seq(Stage("dc_report", "SELECT * FROM dc_src"))),
      destination = Some(InMemoryDestination("dc_report")))
    val e = intercept[Runner.PipelineError](Runner.run(spark, aq, new CollectingTracker))
    assert(e.getMessage.contains("Duplicate"))
    assert(!spark.catalog.tableExists("dc_src")) // nothing ran, nothing leaked
  }

  test("README example pipeline runs end-to-end (reference examples/aqueduct_pipeline_example.yml)") {
    // Stage the reference's CSV fixtures in a writable dir (the config's
    // ${local_path} prefix covers both inputs and the output table).
    val base = tmpDir("example-pipeline")
    val ex = base.resolve("examples")
    java.nio.file.Files.createDirectories(ex)
    Seq("temp_readings_jan_2024.csv", "temp_readings_feb_2024.csv", "location_dict.csv").foreach { f =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/reference/examples/$f"), ex.resolve(f))
    }
    val tracker = new CollectingTracker
    Runner.runFile(spark,
      java.nio.file.Paths.get("/root/reference/examples/aqueduct_pipeline_example.yml"),
      Map("local_path" -> base.toString, "run_id" -> "t1"),
      tracker)
    val tableLoc = Location(base.resolve("examples/output_delta_example/t1").toString)
    val out = graft.destinations.ManagedTable.read(spark, tableLoc)
    assert(out.count() > 0)
    assert(out.schema.fieldNames.toSeq ==
      Seq("date", "location_id", "min_temp_c", "min_humidity", "max_temp_c",
        "max_humidity", "avg_temp_c", "avg_humidity"))
    assert(out.schema("date").dataType == org.apache.spark.sql.types.DateType)
    assert(out.schema("location_id").dataType == org.apache.spark.sql.types.IntegerType)
    // stage debug outputs fired: show 20, show 0, print_schema
    assert(tracker.outputs.count(_._2 == OutputType.Show) == 2)
    assert(tracker.outputs.count(_._2 == OutputType.PrintSchema) == 1)
    // re-running upserts on `date` keys: identical source ⇒ stable row count
    Runner.runFile(spark,
      java.nio.file.Paths.get("/root/reference/examples/aqueduct_pipeline_example.yml"),
      Map("local_path" -> base.toString, "run_id" -> "t1"))
    val again = graft.destinations.ManagedTable.read(spark, tableLoc)
    assert(again.count() == out.count())
  }

  test("failed pipeline leaves the shared session clean (views + cache)") {
    val dir = tmpDir("runner-fail")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(dir.resolve("in.parquet").toString)
    // caller-owned in-memory source must survive the failure
    Seq((9L, "keep")).toDF("id", "name").createOrReplaceTempView("caller_owned")
    val aq = Aqueduct(
      sources = Seq(
        InMemorySource("caller_owned"),
        FileSource("f_src", ParquetFormat(), Location(dir.resolve("in.parquet").toString))),
      stages = Seq(
        // two consumers → s1 gets persisted before the failure downstream
        Seq(Stage("s1", "SELECT id, name FROM f_src")),
        Seq(Stage("s2a", "SELECT count(*) AS n FROM s1"),
            Stage("s2b", "SELECT CAST(name AS BIGINT) + nosuchcol AS boom FROM s1"))))
    assertThrows[Runner.PipelineError](Runner.run(spark, aq, new CollectingTracker))
    // pipeline-owned views and caches are gone; caller's view is untouched
    Seq("f_src", "s1", "s2a").foreach(v => assert(!spark.catalog.tableExists(v), v))
    assert(spark.catalog.tableExists("caller_owned"))
    spark.catalog.dropTempView("caller_owned")
  }

  test("repo examples/ pipelines run end-to-end against the test data") {
    val sf = "/root/testdata/sf0.001"
    val out = tmpDir("repo-examples")

    Runner.runFile(spark, java.nio.file.Paths.get("examples/orders_summary.yml"),
      Map("sf_dir" -> sf, "out_dir" -> out.toString), new CollectingTracker)
    val csv = spark.read.option("header", "true")
      .csv(out.resolve("orders_summary.csv").toString)
    assert(csv.columns.toSeq == Seq("dim", "value", "n") && csv.count() > 0)

    Runner.runFile(spark, java.nio.file.Paths.get("examples/managed_table_upsert.yml"),
      Map("sf_dir" -> sf, "table_dir" -> out.resolve("customers").toString), new CollectingTracker)
    val tbl = graft.destinations.ManagedTable.read(
      spark, Location(out.resolve("customers").toString))
    assert(tbl.count() > 0)
    assert(tbl.schema("balance").dataType == org.apache.spark.sql.types.DoubleType)

    Runner.runFile(spark, java.nio.file.Paths.get("examples/documents_dedup.yml"),
      Map("sf_dir" -> sf, "out_dir" -> out.resolve("docs").toString), new CollectingTracker)
    val clean = spark.read.parquet(out.resolve("docs/clean").toString)
    assert(clean.columns.contains("lang") && clean.count() > 0)
    // dedup really deduplicated: fewer or equal rows than the corpus
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(clean.count() <= corpus)

    Runner.runFile(spark, java.nio.file.Paths.get("examples/text_curation.yml"),
      Map("sf_dir" -> sf, "out_dir" -> out.resolve("cur").toString), new CollectingTracker)
    val curated = spark.read.parquet(out.resolve("cur/curated").toString)
    assert(curated.columns.toSet ==
      Set("doc_id", "lang", "lang_pred", "quality", "n_tokens"))
    assert(curated.count() > 0 && curated.count() < corpus) // filter has bite

    Runner.runFile(spark, java.nio.file.Paths.get("examples/corpus_stats.yml"),
      Map("sf_dir" -> sf, "out_dir" -> out.resolve("stats").toString), new CollectingTracker)
    val terms = spark.read.option("header", "true")
      .csv(out.resolve("stats/top_terms").toString)
    assert(terms.columns.toSeq == Seq("lang", "word", "n", "rank"))
    // 10 terms per language present in the corpus slice
    assert(terms.groupBy("lang").count().collect().forall(_.getLong(1) == 10L))
  }
}
