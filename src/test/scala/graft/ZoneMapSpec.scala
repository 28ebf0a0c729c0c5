package graft

import org.apache.spark.sql.functions._
import graft.operators.ZoneMap

/** Zone-map audit: footer stats must agree with the data, and the overlap
  * metric must separate a range-sorted layout from a scattered one.
  */
class ZoneMapSpec extends SparkSpec {

  test("rowGroupStats reads exact footer ranges; overlap separates layouts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("zm_spec").toString
    val df = (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v")

    // range-sorted: each of 4 files holds a disjoint k range
    df.repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.parquet(s"$root/sorted")
    val sStats = ZoneMap.rowGroupStats(spark, s"$root/sorted", "k")
    assert(sStats.agg(sum("n_rows")).head().getLong(0) == 4000L, "row counts off")
    val sq = ZoneMap.clusteringQuality(sStats).head()
    assert(sq.getAs[Long]("n_overlapping") == 0L,
      s"sorted layout shows overlaps: $sq")
    assert(sq.getAs[Long]("global_min") == 0L && sq.getAs[Long]("global_max") == 3999L)
    // 4 disjoint slices of 4000 keys → each spans ~25% of the range
    assert(sq.getAs[Long]("span_pct_e4") <= 2600L, s"sorted spans too wide: $sq")

    // round-robin scatter: every file spans ~the full range → all overlap
    df.repartition(4).write.parquet(s"$root/scattered")
    val cq = ZoneMap.clusteringQuality(
      ZoneMap.rowGroupStats(spark, s"$root/scattered", "k")).head()
    assert(cq.getAs[Long]("n_overlapping") == cq.getAs[Long]("n_row_groups") - 1,
      s"scattered layout should overlap everywhere: $cq")
    assert(cq.getAs[Long]("span_pct_e4") >= 9000L, s"scatter should span ~100%: $cq")

    // demo frame: morton layout materially tighter than naive on span.
    // sf0.01 on purpose — at sf0.001 there are ~15 distinct users, so 8
    // files cannot carve distinct user ranges no matter the layout
    val audit = ZoneMap.zoneMapAudit(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("span_pct_e4")).toMap
    assert(audit("morton") < audit("naive") * 8 / 10,
      s"morton ${audit("morton")} not tighter than naive ${audit("naive")}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("bloom index prunes files on point lookups without losing rows") {
    import spark.implicits._
    import graft.operators.BloomIndex
    val root = java.nio.file.Files.createTempDirectory("bfidx").toString
    // 16 files hashed by key: every key lives in exactly one file
    val df = (1L to 4000L).map(i => (i % 200, i)).toDF("k", "payload")
    df.repartition(16, col("k")).write.parquet(s"$root/t")
    BloomIndex.build(spark, s"$root/t", "k", s"$root/idx")
    val (m, total, read) = BloomIndex.lookup(spark, s"$root/t", s"$root/idx", "k", Seq(7L, 8L))
    assert(total === 16L)
    assert(read < total, s"no pruning: read $read of $total")
    // exactness: pruned read returns precisely the unpruned answer
    val expected = df.filter(col("k").isin(7L, 8L)).select("k", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = m.select("k", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // absent key: bloom may false-positive into a file read, but the
    // exact filter returns nothing
    val (none, _, _) = BloomIndex.lookup(spark, s"$root/t", s"$root/idx", "k", Seq(9999L))
    assert(none.count() === 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("bloom shortlist is distributed: driver sees file NAMES, never payloads") {
    import spark.implicits._
    import graft.operators.BloomIndex
    val root = java.nio.file.Files.createTempDirectory("bfidx2").toString
    // a many-file table (64 files) — the shape where collecting the bloom
    // payloads to the driver would be the 100 GB mistake at 100 TB scale
    val df = (1L to 16000L).map(i => (i % 800, i)).toDF("k", "payload")
    df.repartition(64, col("k")).write.parquet(s"$root/t")
    BloomIndex.build(spark, s"$root/t", "k", s"$root/idx")
    val probes = Seq(3L, 42L)
    val (total, hits) = BloomIndex.shortlist(spark, s"$root/idx", probes)
    assert(total === 64L)
    // shortlist carries ONLY path strings (payloads die executor-side)
    assert(hits.forall(_.endsWith(".parquet")), hits.mkString(","))
    assert(hits.length < 64, s"no pruning: ${hits.length} of 64")
    // no false negatives: every file that truly holds a probe key is listed
    val truth = spark.read.parquet(s"$root/t")
      .filter(col("k").isin(probes: _*))
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(hits.toSet),
      s"missed files: ${truth.diff(hits.toSet).mkString(",")}")
    // end-to-end through lookup: identical answer to an unpruned scan
    val (m, t2, r2) = BloomIndex.lookup(spark, s"$root/t", s"$root/idx", "k", probes)
    assert(t2 === 64L && r2 === hits.length.toLong)
    val expected = df.filter(col("k").isin(probes: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.select("k", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
