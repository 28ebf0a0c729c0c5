package graft

import org.apache.spark.sql.functions._
import graft.cdc.TableRegistry
import graft.cdc.TableRegistry.TableMeta

/** Multi-table registry + priority batch selection (SURVEY §2 #90). */
class TableRegistrySpec extends SparkSpec {

  private def meta(name: String, freq: Double, lastH: Option[Double],
      errors: Int = 0, enabled: Boolean = true, rows: Long = 1000L) =
    TableMeta(name, "db", rows, 100.0, freq, lastH, errors, Some("id"), enabled)

  test("priority formula mirrors the reference weights") {
    val reg = TableRegistry.fromMetadata(spark, Seq(
      meta("hot_never_processed", 100.0, None),           // 4000 + 5 + 30 = 4035
      meta("hot_recent", 100.0, Some(2.0)),               // 4000 + 5 + 4  = 4009
      meta("cold_stale", 0.1, Some(500.0)),               // 4 + 5 + 30    = 39
      meta("errory", 10.0, Some(10.0), errors = 7)))      // 400 + 5 + 20 - 10 = 415
    val got = TableRegistry.withPriorities(reg)
      .select("name", "priority").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot_never_processed" -> 4035L, "hot_recent" -> 4009L,
      "cold_stale" -> 39L, "errory" -> 415L))
  }

  test("size buckets feed the priority") {
    val reg = TableRegistry.fromMetadata(spark, Seq(
      meta("tiny", 0.1, Some(500.0), rows = 1000L),              // ~0.1 MB -> +5
      meta("mid", 0.1, Some(500.0), rows = 2_000_000L),          // ~190 MB -> +15
      meta("big", 0.1, Some(500.0), rows = 20_000_000L)))        // ~1.9 GB -> +20
    val got = TableRegistry.withPriorities(reg)
      .select("name", "priority").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("tiny") == 39L && got("mid") == 49L && got("big") == 54L)
  }

  test("nextBatch drops disabled and recently-processed tables, keeps top-N") {
    val reg = TableRegistry.fromMetadata(spark, Seq(
      meta("a_hot", 100.0, None),
      meta("b_disabled", 100.0, None, enabled = false),
      meta("c_too_recent", 100.0, Some(0.2)),
      meta("d_mid", 10.0, Some(10.0)),
      meta("e_cold", 0.1, Some(500.0)),
      meta("f_cold2", 0.1, Some(400.0))))
    val batch = TableRegistry.nextBatch(reg, maxTables = 3)
      .select("name").collect().map(_.getString(0))
    assert(batch.toSeq == Seq("a_hot", "d_mid", "e_cold"))
  }

  test("discover registers every testdata table with real row counts") {
    val reg = TableRegistry.discover(spark, sf)
    assert(reg.count() == 10)
    // footer counts must equal real counts for every table, not just events
    val li = reg.filter(col("name") === "lineitem").select("row_count").head().getLong(0)
    assert(li == spark.read.parquet(s"$sf/lineitem.parquet").count())
    val ev = reg.filter(col("name") === "events").select("row_count").head().getLong(0)
    assert(ev == Tables.events(spark, sf).count())
    val batch = TableRegistry.tableBatch(spark, sf).collect()
    assert(batch.length == 5)
    // events (never processed) outranks everything; disabled region absent
    assert(batch.head.getAs[String]("name") == "events")
    assert(!batch.map(_.getAs[String]("name")).contains("region"))
    assert(!batch.map(_.getAs[String]("name")).contains("orders")) // interval skip
  }

  test("markProcessed feeds the scheduling loop: success resets, failure penalizes") {
    val reg = TableRegistry.fromMetadata(spark, Seq(
      meta("a", 100.0, Some(10.0), errors = 2),
      meta("b", 100.0, Some(10.0))))
    // success: error state cleared, staleness zeroed → out of next batch
    val ok = TableRegistry.markProcessed(reg, "a", success = true)
    val aRow = ok.filter(col("name") === "a").head()
    assert(aRow.getAs[Double]("last_processed_hours") == 0.0)
    assert(aRow.getAs[Int]("error_count") == 0)
    assert(aRow.getAs[String]("last_error") == null)
    val next = TableRegistry.nextBatch(ok, maxTables = 5)
      .collect().map(_.getAs[String]("name"))
    assert(!next.contains("a") && next.contains("b"),
      "freshly-processed table must sit out the min interval")
    // failure: error count climbs (priority penalty), message recorded
    val bad = TableRegistry.markProcessed(ok, "b", success = false,
      error = Some("connection reset"))
    val bRow = bad.filter(col("name") === "b").head()
    assert(bRow.getAs[Int]("error_count") == 1)
    assert(bRow.getAs[String]("last_error") == "connection reset")
    // untouched rows keep their state through both updates
    assert(bad.filter(col("name") === "a").head().getAs[Int]("error_count") == 0)
  }

  test("tableGroups and registryStats roll the registry up without a collect") {
    val reg = TableRegistry.discover(spark, sf)
    val groups = TableRegistry.tableGroups(reg).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(groups("lineitem")._2 == "high_frequency")
    assert(groups("region") == (("small", "low_frequency")))
    val st = TableRegistry.registryStats(reg).head()
    assert(st.getAs[Long]("n_tables") == 10)
    assert(st.getAs[Long]("n_enabled") == 9 && st.getAs[Long]("n_disabled") == 1)
    assert(st.getAs[Long]("total_rows") > 0)
  }

  test("discover is one metadata job, not one count job per table") {
    val sc = spark.sparkContext
    sc.setJobGroup("discover-jobs", "registry discover job count", false)
    try {
      // building the registry frame is fully lazy
      val reg = TableRegistry.discover(spark, sf)
      assert(sc.statusTracker.getJobIdsForGroup("discover-jobs").isEmpty,
        "discover must not run eager per-table jobs")
      reg.collect()
      val jobs = sc.statusTracker.getJobIdsForGroup("discover-jobs").length
      // footer job + final agg (AQE may materialize each exchange as a
      // job) — must stay far below one-job-per-table
      assert(jobs <= 4, s"discover ran $jobs jobs for 10 tables")
    } finally sc.clearJobGroup()
  }

  test("registry state survives a restart via save/load checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("reg_ckpt").toString
    try {
      // session 1: discover, take some scheduling feedback, checkpoint
      val reg0 = TableRegistry.discover(spark, sf)
      val reg1 = TableRegistry.markProcessed(reg0, "orders", success = true)
      val reg2 = TableRegistry.markProcessed(reg1, "supplier",
        success = false, error = Some("replication lag"))
      val g0 = TableRegistry.save(reg2, dir)
      assert(g0 == 0L)
      // "restart": load from disk only — no reference to the live frames
      val loaded = TableRegistry.load(spark, dir)
      val byName = loaded.collect()
        .map(r => r.getAs[String]("name") -> r).toMap
      // success reset orders' clock; failure bumped supplier's error state
      assert(byName("orders").getAs[Double]("last_processed_hours") == 0.0)
      val sup = byName("supplier")
      assert(sup.getAs[Int]("error_count") == 4) // discover profile 3 + 1
      assert(sup.getAs[String]("last_error") == "replication lag")
      // priorities recompute identically from the restored state
      val p = TableRegistry.withPriorities(loaded)
        .filter(col("name") === "supplier").select("priority").first().getLong(0)
      assert(p > 0)
      // a second save writes a NEW generation; load picks the newest
      val g1 = TableRegistry.save(
        TableRegistry.markProcessed(loaded, "supplier", success = true), dir)
      assert(g1 == 1L)
      val re = TableRegistry.load(spark, dir)
      val sup2 = re.filter(col("name") === "supplier").first()
      assert(sup2.getAs[Int]("error_count") == 0 &&
        sup2.getAs[String]("last_error") == null)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("discoverJdbc auto-registers Derby tables with keys and counts") {
    val reg = TableRegistry.jdbcCatalogBatch(spark, sf).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(reg.size == 2)
    assert(reg("cdc_users").getAs[String]("partition_key") == "user_id")
    assert(reg("cdc_orders").getAs[String]("partition_key") == "o_orderkey")
    assert(reg("cdc_users").getAs[Long]("row_count") > 0)
    assert(reg.values.forall(_.getAs[Boolean]("cdc_enabled")))
    // discovered metadata flows into the shared priority scoring
    val batch = TableRegistry.nextBatch(
      TableRegistry.discoverJdbc(spark, "jdbc:derby:memory:graftcat"),
      maxTables = 1)
    assert(batch.count() == 1)
  }

  test("retention sweep reclaims old generations, never the current") {
    val dir = java.nio.file.Files.createTempDirectory("reg_sweep").toString
    try {
      val reg = TableRegistry.discover(spark, sf)
      var latest = reg
      for (i <- 0 until 4) {
        latest = TableRegistry.markProcessed(latest, "orders", success = i % 2 == 0)
        TableRegistry.save(latest, dir)
      }
      // plant a crashed-compaction leftover beside the generations
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "orders__retired"))
      val deleted = Tables.retentionSweep(spark, dir, keepLast = 2)
      assert(deleted.sorted == Seq("gen=0", "gen=1", "orders__retired"))
      // the newest snapshot is still fully readable after the sweep
      val survived = TableRegistry.load(spark, dir)
      assert(survived.count() == reg.count())
      // sweeping again is a no-op
      assert(Tables.retentionSweep(spark, dir, keepLast = 2).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("backlog ETA: exact arithmetic, CDC-disabled tables excluded") {
    import org.apache.spark.sql.functions.col
    val out = TableRegistry.backlogEta(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(!out.contains("region"), "cdc-disabled table must not appear")
    // lineitem: freq 100/h, 1h stale -> 100*1*100 = 10000 pending
    assert(out("lineitem")._1 === 10000L)
    // events was never processed: the 48h onboarding horizon applies
    assert(out("events")._1 === 480000L)
    out.foreach { case (name, (pending, drain, eta, breach)) =>
      assert(drain > 0, s"$name drain")
      assert(eta === pending * 60 / drain, s"$name eta arithmetic")
      assert(breach === (if (eta > 3600) 1L else 0L), s"$name breach flag")
    }
  }
}
