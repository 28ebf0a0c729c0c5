package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.TableRegistry
import graft.cdc.TableRegistry.TableMeta
import graft.streaming.StreamOrchestrator

/** Per-table streaming-query lifecycle (SURVEY §2 #116): registry batch →
  * N independent checkpointed queries; stop isolation; restart from each
  * table's own checkpoint with exactly-once delivery.
  */
class OrchestratorSpec extends SparkSpec {

  private def meta(name: String, freq: Double) =
    TableMeta(name, "db", 10000L, 100.0, freq, None, 0, Some("id"), cdc_enabled = true)

  private def mkStream(maxRows: Long)(table: String): DataFrame =
    spark.readStream.format("cdcgen")
      .option("rowsperbatch", 100L)
      .option("maxrows", maxRows)
      .option("seed", math.abs(table.hashCode.toLong))
      .load()

  test("registry batch starts one checkpointed query per table; stopping one leaves the rest committing") {
    val ck = Files.createTempDirectory("orch_ck").toString
    val out = Files.createTempDirectory("orch_out").toString
    val orch = new StreamOrchestrator(spark, ck, out)
    val batch = TableRegistry.nextBatch(
      TableRegistry.fromMetadata(spark, Seq(
        meta("t_a", 100.0), meta("t_b", 50.0), meta("t_c", 10.0))), maxTables = 3)
    try {
      val started = orch.startBatch(batch, mkStream(maxRows = 100000L))
      assert(started.sorted == Seq("t_a", "t_b", "t_c"))
      assert(orch.activeTables == Seq("t_a", "t_b", "t_c"))
      // each query owns its checkpoint directory
      Seq("t_a", "t_b", "t_c").foreach { t =>
        assert(new java.io.File(s"$ck/$t").exists(), s"no checkpoint dir for $t")
      }

      orch.stopTable("t_b")
      assert(orch.activeTables == Seq("t_a", "t_c"))

      // the survivors keep committing micro-batches after the stop
      def batchId(t: String): Long = {
        val row = orch.status.filter(col("table") === t).head()
        row.getAs[Long]("last_batch_id")
      }
      val before = Seq("t_a", "t_c").map(batchId)
      val deadline = System.currentTimeMillis() + 30000
      var after = before
      while (after.zip(before).exists { case (a, b) => a <= b } &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        after = Seq("t_a", "t_c").map(batchId)
      }
      assert(after.zip(before).forall { case (a, b) => a > b },
        s"surviving queries stalled after stopping t_b: $before -> $after")

      // status frame mirrors the registry incl. the stopped table
      val st = orch.status.collect().map(r =>
        r.getAs[String]("table") -> r.getAs[Boolean]("is_active")).toMap
      assert(st == Map("t_a" -> true, "t_b" -> false, "t_c" -> true))
    } finally orch.stopAll()
  }

  test("restart from the per-table checkpoint resumes exactly-once") {
    val ck = Files.createTempDirectory("orch_ck2").toString
    val out = Files.createTempDirectory("orch_out2").toString
    val maxRows = 500L
    val orch = new StreamOrchestrator(spark, ck, out)
    try {
      // phase 1: deliver everything, then stop (simulated shutdown)
      orch.startTable("t_r", mkStream(maxRows))
      orch.processAllAvailable()
      orch.stopTable("t_r")
      val afterFirst = spark.read.parquet(s"$out/t_r").count()
      assert(afterFirst == maxRows)

      // phase 2: restart against the same checkpoint — no re-delivery
      val orch2 = new StreamOrchestrator(spark, ck, out)
      try {
        orch2.startTable("t_r", mkStream(maxRows))
        orch2.processAllAvailable()
      } finally orch2.stopAll()
      val df = spark.read.parquet(s"$out/t_r")
      assert(df.count() == maxRows, "restart re-delivered rows")
      assert(df.select("event_id").distinct().count() == maxRows)
    } finally orch.stopAll()
  }

  test("orchestration demo reports exactly-once delivery for the full registry batch") {
    val demo = StreamOrchestrator.orchestrationDemo(spark, sf).collect()
    assert(demo.length == 3)
    assert(demo.forall(_.getAs[Boolean]("exactly_once")),
      s"demo rows: ${demo.mkString(", ")}")
  }

  test("AvailableNow backfill drains the backlog, stops itself, resumes incrementally") {
    val root = Files.createTempDirectory("orch_bf").toString
    val tables = Seq("t1", "t2")
    def addFile(t: String, name: String, lines: Seq[String]): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$root/in/$t"))
      Files.write(java.nio.file.Paths.get(s"$root/in/$t/$name"),
        lines.mkString("\n").getBytes)
    }
    tables.foreach(t => addFile(t, "a.txt", Seq(s"$t-1", s"$t-2", s"$t-3")))
    val orch = new StreamOrchestrator(spark, s"$root/ck", s"$root/out")
    import spark.implicits._
    val batch = tables.toDF("name")
    def mk(t: String): DataFrame = spark.readStream.text(s"$root/in/$t")
    try {
      // first drain: all existing files, then the queries stop themselves
      orch.backfillBatch(batch, mk)
      assert(orch.activeTables.isEmpty, "backfill queries must self-terminate")
      tables.foreach { t =>
        assert(spark.read.parquet(s"$root/out/$t").count() == 3, s"$t backlog")
      }
      // second drain after new data lands in ONE table: incremental, no
      // re-delivery, untouched table stays untouched
      addFile("t1", "b.txt", Seq("t1-4", "t1-5"))
      orch.backfillBatch(batch, mk)
      val t1 = spark.read.parquet(s"$root/out/t1").as[String].collect().sorted
      assert(t1.sameElements(Array("t1-1", "t1-2", "t1-3", "t1-4", "t1-5")),
        s"t1 after incremental drain: ${t1.mkString(",")}")
      assert(spark.read.parquet(s"$root/out/t2").count() == 3)
    } finally orch.stopAll()
  }

  test("supervise restarts dead queries from their checkpoints, leaves live ones alone") {
    val root = Files.createTempDirectory("orch_sup").toString
    val tables = Seq("t1", "t2")
    def addFile(t: String, name: String, lines: Seq[String]): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$root/in/$t"))
      Files.write(java.nio.file.Paths.get(s"$root/in/$t/$name"),
        lines.mkString("\n").getBytes)
    }
    tables.foreach(t => addFile(t, "a.txt", Seq(s"$t-1", s"$t-2")))
    val orch = new StreamOrchestrator(spark, s"$root/ck", s"$root/out")
    import spark.implicits._
    def mk(t: String): DataFrame = spark.readStream.text(s"$root/in/$t")
    try {
      orch.startBatch(tables.toDF("name"), mk)
      orch.processAllAvailable()
      orch.stopTable("t1")
      val t2Run = orch.status.filter(col("table") === "t2").head().getAs[String]("run_id")
      // a cleanly-stopped query is not a failure: onlyFailed leaves it down
      assert(orch.supervise(mk, onlyFailed = true).isEmpty)
      assert(orch.activeTables == Seq("t2"))
      // full supervision brings it back from its own checkpoint
      assert(orch.supervise(mk) == Seq("t1"))
      assert(orch.activeTables == Seq("t1", "t2"))
      // the restart resumes exactly-once and keeps committing new input
      addFile("t1", "b.txt", Seq("t1-3"))
      orch.processAllAvailable()
      val t1 = spark.read.parquet(s"$root/out/t1").as[String].collect().sorted
      assert(t1.sameElements(Array("t1-1", "t1-2", "t1-3")),
        s"t1 after supervised restart: ${t1.mkString(",")}")
      // the live query was never touched (same run), and no errors surfaced
      val st = orch.status.collect().map(r =>
        r.getAs[String]("table") -> r).toMap
      assert(st("t2").getAs[String]("run_id") == t2Run, "t2 was restarted")
      assert(st.values.forall(_.getAs[String]("error_message") == null))
    } finally orch.stopAll()
  }

  test("live DDL mid-stream: version bump restarts the table on the new schema, no lost batches") {
    import org.apache.spark.sql.types._
    import graft.sources.SchemaRegistry
    val ck = Files.createTempDirectory("orch_ddl_ck").toString
    val out = Files.createTempDirectory("orch_ddl_out").toString
    val in = Files.createTempDirectory("orch_ddl_in").toString
    val orch = new StreamOrchestrator(spark, ck, out)
    SchemaRegistry.clear()

    def schemaFor(v: Int): StructType =
      if (v >= 2) StructType(Seq(StructField("a", LongType),
        StructField("b", StringType)))
      else StructType(Seq(StructField("a", LongType)))
    def mk(table: String, v: Int): DataFrame =
      spark.readStream.schema(schemaFor(v)).json(s"$in/$table")
    def avro(v: Int): org.apache.avro.Schema = {
      import org.apache.avro.SchemaBuilder
      val f = SchemaBuilder.record("t").fields()
        .name("a").`type`().longType().noDefault()
      (if (v >= 2) f.name("b").`type`().optional().stringType() else f)
        .endRecord()
    }

    try {
      // generation 1 registered + streaming
      SchemaRegistry.register("t_ddl", avro(1))
      Files.createDirectories(java.nio.file.Paths.get(s"$in/t_ddl"))
      Files.writeString(java.nio.file.Paths.get(s"$in/t_ddl/f1.json"),
        """{"a":1}""" + "\n" + """{"a":2}""")
      orch.startTable("t_ddl", t => mk(t, 1))
      orch.processAllAvailable()
      val run1 = orch.status.filter(col("table") === "t_ddl")
        .head().getAs[String]("run_id")

      // no bump registered -> reactToDdl is a no-op
      assert(orch.reactToDdl(mk).isEmpty)

      // DDL lands mid-stream: generation 2 adds column b
      SchemaRegistry.register("t_ddl", avro(2))
      val bumps = orch.reactToDdl(mk)
      assert(bumps == Seq(("t_ddl", 1, 2)), s"got $bumps")
      val run2 = orch.status.filter(col("table") === "t_ddl")
        .head().getAs[String]("run_id")
      assert(run2 != run1, "query must restart on the new schema")

      // post-DDL data carries the new column; same checkpoint resumes
      Files.writeString(java.nio.file.Paths.get(s"$in/t_ddl/f2.json"),
        """{"a":3,"b":"x"}""" + "\n" + """{"a":4,"b":"y"}""")
      orch.processAllAvailable()
      val got = spark.read.option("mergeSchema", "true").parquet(s"$out/t_ddl")
      // nothing lost across the restart, new column visible on new rows
      assert(got.select("a").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 3L, 4L))
      assert(got.columns.contains("b"))
      assert(got.filter(col("b").isNotNull).count() === 2)
      // idempotent: replaying the same DDL stream bumps nothing
      SchemaRegistry.register("t_ddl", avro(2))
      assert(orch.reactToDdl(mk).isEmpty)
    } finally { orch.stopAll(); SchemaRegistry.clear() }
  }
}
