package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.streaming.{BucketedGold, CdcStreams}

/** The log-structured bucketed gold target (round-9 latency-floor fix):
  * commit = O(batch) delta append, query = merge-on-read SCD1, compaction
  * folds deltas into touched buckets only. Pins equivalence with the
  * full-rewrite `applyCdcBatch`, replay idempotence, tombstone semantics'
  * independence from compaction timing, and the pruned-bucket rewrite.
  */
class BucketedGoldSpec extends SparkSpec {

  private def batchDF(rows: (Long, String, Long, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "operation", "ts_us", "event_id", "value")
  }

  private def stateSet(df: DataFrame): Set[(Long, String, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSet

  test("append+read matches the full-rewrite applyCdcBatch state") {
    val root = Files.createTempDirectory("bg-eq").toString
    val flat = s"$root/flat"
    val b1 = batchDF((1L, "INSERT", 10L, 1L, 1.0), (2L, "INSERT", 11L, 2L, 2.0),
      (3L, "INSERT", 12L, 3L, 3.0))
    val b2 = batchDF((1L, "UPDATE", 20L, 4L, 1.5), (2L, "DELETE", 21L, 5L, 0.0),
      (4L, "INSERT", 22L, 6L, 4.0))
    val b3 = batchDF((3L, "UPDATE", 30L, 7L, 3.5), (4L, "UPDATE", 31L, 8L, 4.5))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      BucketedGold.appendBatch(spark, b, s"$root/gold", i.toLong, numBuckets = 8)
      CdcStreams.applyCdcBatch(spark, b, flat)
    }
    val bucketed = stateSet(BucketedGold.read(spark, s"$root/gold"))
    val rewrite = stateSet(spark.read.parquet(flat)
      .select("user_id", "operation", "ts_us", "event_id", "value"))
    assert(bucketed === rewrite)
    assert(bucketed.map(_._1) === Set(1L, 3L, 4L)) // user 2 deleted
  }

  test("compaction changes nothing a reader can see, and GC'd deltas are gone") {
    val root = Files.createTempDirectory("bg-compact").toString
    val gold = s"$root/gold"
    (0 until 6).foreach { i =>
      val op = if (i == 3) "DELETE" else "UPDATE"
      BucketedGold.appendBatch(spark, batchDF(
        (i.toLong % 3, op, 100L + i, i.toLong, i * 1.0),
        (100L + i, "INSERT", 100L + i, 1000L + i, i * 2.0)),
        gold, i.toLong, numBuckets = 8, compactEvery = 1000)
    }
    val before = stateSet(BucketedGold.read(spark, gold))
    BucketedGold.compact(spark, gold, numBuckets = 8)
    val after = stateSet(BucketedGold.read(spark, gold))
    assert(before === after)
    // folded deltas survive ONE grace cycle (so concurrent readers'
    // listings stay valid), then the next compaction retires them
    val deltaDir = new java.io.File(s"$gold/delta")
    assert(deltaDir.listFiles().exists(_.isDirectory),
      "folded deltas should persist through the grace cycle")
    assert(stateSet(BucketedGold.read(spark, gold)) === before) // dedup'd
    BucketedGold.compact(spark, gold, numBuckets = 8)
    assert(!deltaDir.exists() || deltaDir.listFiles().forall(!_.isDirectory))
    assert(stateSet(BucketedGold.read(spark, gold)) === before)
    assert(new java.io.File(s"$gold/base").listFiles()
      .exists(_.getName.startsWith("bucket=")))
  }

  test("replayed batch id replaces its own delta — exactly-once under replay") {
    val root = Files.createTempDirectory("bg-replay").toString
    val gold = s"$root/gold"
    val b = batchDF((7L, "INSERT", 10L, 1L, 7.0))
    BucketedGold.appendBatch(spark, b, gold, 0L)
    // crash-and-replay: the SAME batch commits again under the same id
    BucketedGold.appendBatch(spark, b, gold, 0L)
    assert(BucketedGold.read(spark, gold).count() === 1)
    // and a crash between compaction's base commit and delta retirement
    // re-merges already-folded rows: simulate by compacting twice with a
    // stale delta copy re-injected
    BucketedGold.compact(spark, gold, numBuckets = 8)
    BucketedGold.appendBatch(spark, b, gold, 0L) // the "unretired" delta
    BucketedGold.compact(spark, gold, numBuckets = 8)
    assert(stateSet(BucketedGold.read(spark, gold)) ===
      Set((7L, "INSERT", 10L, 1L, 7.0)))
  }

  test("tombstones shadow late pre-delete events across compaction timing") {
    // key deleted at ts=100; a straggler UPDATE with ts=50 arrives later.
    // Merge-on-read keeps the DELETE as latest -> key stays gone, and
    // because compaction RETAINS tombstones the answer is the same
    // whether the straggler lands before or after a compaction.
    Seq(true, false).foreach { compactBetween =>
      val root = Files.createTempDirectory("bg-tomb").toString
      val gold = s"$root/gold"
      BucketedGold.appendBatch(spark, batchDF(
        (5L, "INSERT", 10L, 1L, 5.0), (6L, "INSERT", 11L, 2L, 6.0)), gold, 0L)
      BucketedGold.appendBatch(spark, batchDF((5L, "DELETE", 100L, 3L, 0.0)), gold, 1L)
      if (compactBetween) BucketedGold.compact(spark, gold, numBuckets = 8)
      BucketedGold.appendBatch(spark, batchDF((5L, "UPDATE", 50L, 4L, 5.5)), gold, 2L)
      val users = BucketedGold.read(spark, gold).collect().map(_.getLong(0)).toSet
      assert(users === Set(6L), s"compactBetween=$compactBetween")
    }
  }

  test("tombstone GC drops old deletes; a GC'd straggler may resurrect (documented)") {
    val root = Files.createTempDirectory("bg-gc").toString
    val gold = s"$root/gold"
    BucketedGold.appendBatch(spark, batchDF((9L, "DELETE", 100L, 1L, 0.0)), gold, 0L)
    BucketedGold.compact(spark, gold, numBuckets = 8,
      gcTombstonesBeforeUs = Some(200L))
    // tombstone physically gone: state empty, and the emptied bucket dir
    // was deleted (dynamic overwrite alone would have left it stale)
    assert(BucketedGold.read(spark, gold).count() === 0)
    val baseDir = new java.io.File(s"$gold/base")
    assert(!baseDir.exists() ||
      !baseDir.listFiles().exists(_.getName.startsWith("bucket=")))
  }

  test("empty micro-batch skips job-free and commits nothing") {
    val root = Files.createTempDirectory("bg-empty").toString
    val gold = s"$root/gold"
    assert(BucketedGold.appendBatch(spark, batchDF((1L, "INSERT", 1L, 1L, 1.0)),
      gold, 0L))
    val deltaDir = new java.io.File(s"$gold/delta")
    val deltasBefore = deltaDir.listFiles().map(_.getName).toSet
    // zero-partition plan (the empty-trigger-cycle shape): probe fires
    // before any job, no scratch dir is ever created, returns false
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      batchDF((1L, "INSERT", 1L, 1L, 1.0)).schema)
    assert(!BucketedGold.appendBatch(spark, empty, gold, 1L))
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      === jobsBefore, "empty-plan probe must not launch a Spark job")
    // zero ROWS behind a non-empty plan: caught post-write by the footer
    // row counts, still no commit
    assert(!BucketedGold.appendBatch(spark,
      batchDF((1L, "INSERT", 1L, 1L, 1.0)).filter("user_id < 0"), gold, 2L))
    assert(deltaDir.listFiles().map(_.getName).toSet === deltasBefore)
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith(".scratch")), "no scratch left behind")
  }

  test("compact sweeps stale foreign-app scratch dirs, keeps own and fresh ones") {
    val root = Files.createTempDirectory("bg-scratch").toString
    val gold = s"$root/gold"
    BucketedGold.appendBatch(spark, batchDF((1L, "INSERT", 1L, 1L, 1.0)), gold, 0L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val appScr = sanitizedAppScratch(gold, 99L) // own app, crash leftover
    val foreignOld = new org.apache.hadoop.fs.Path(s"$gold/.scratch-deadapp-b7")
    val legacyOld = new org.apache.hadoop.fs.Path(s"$gold/.scratch-b3")
    val foreignFresh = new org.apache.hadoop.fs.Path(s"$gold/.scratch-liveapp-b1")
    Seq(appScr, foreignOld, legacyOld, foreignFresh).foreach(fs.mkdirs(_))
    val old = System.currentTimeMillis() - 16L * 60 * 1000
    Seq(appScr, foreignOld, legacyOld).foreach(fs.setTimes(_, old, -1))
    BucketedGold.compact(spark, gold, numBuckets = 8)
    assert(!fs.exists(foreignOld), "stale foreign scratch must be swept")
    assert(!fs.exists(legacyOld), "stale legacy-name scratch must be swept")
    assert(fs.exists(foreignFresh), "fresh foreign scratch must survive (grace)")
    assert(fs.exists(appScr), "own-app scratch is owned by appendBatch, not swept")
  }

  private def sanitizedAppScratch(gold: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$gold/.scratch-" +
      spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "") +
      s"-b$batchId")

  test("compaction rewrites only the buckets the deltas touch") {
    val root = Files.createTempDirectory("bg-prune").toString
    val gold = s"$root/gold"
    // seed many keys across buckets, compact to a full base
    val seed = (0L until 64L).map(i => (i, "INSERT", 10L + i, i, i * 1.0))
    BucketedGold.appendBatch(spark, batchDF(seed: _*), gold, 0L, numBuckets = 8)
    BucketedGold.compact(spark, gold, numBuckets = 8)
    def baseFiles(): Map[String, Set[String]] =
      new java.io.File(s"$gold/base").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    val before = baseFiles()
    assert(before.size > 1, "seed should span several buckets")
    // one-key delta -> exactly one touched bucket
    BucketedGold.appendBatch(spark, batchDF((3L, "UPDATE", 999L, 999L, 3.5)),
      gold, 1L, numBuckets = 8)
    BucketedGold.compact(spark, gold, numBuckets = 8)
    val after = baseFiles()
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
    assert(stateSet(BucketedGold.read(spark, gold))
      .contains((3L, "UPDATE", 999L, 999L, 3.5)))
  }
}
