package graft.operators

import java.io.ByteArrayInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.Tables

/** Mergeable-sketch monitoring operators.
  *
  * The CDC monitoring layer needs "who are the hot keys" answers without
  * a full groupBy when key cardinality explodes (the reference's
  * per-table throughput monitors, dlt_cdc_pipeline.py:413-438, at 500
  * tables × millions of entities). `count_min_sketch` is Spark's built-in
  * mergeable frequency sketch: map-side partial sketches merge
  * associatively into O(w·d) state regardless of key count — the same
  * update/merge shape as the custom MinHashAgg, via functions-not-UDFs.
  */
object Sketches {

  val Eps = 0.001
  val Confidence = 0.99
  val Seed = 42

  /** The corpus-wide Count-Min sketch of a key column (one binary row). */
  def cmSketch(df: DataFrame, keyCol: String): CountMinSketch = {
    val bytes = df.agg(
      expr(s"count_min_sketch($keyCol, ${Eps}d, ${Confidence}d, $Seed)").as("sk"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** #98 Heavy-hitter audit: sketch-estimated vs exact counts for the
    * top-k talkers. Deterministic (fixed seed; merges commute), and the
    * CM guarantee — exact ≤ estimate ≤ exact + ε·N — is asserted as
    * columns so the driver check pins it at every scale factor.
    *
    * Cost note: the exact `groupBy(user_id)` full aggregation here is the
    * AUDIT's cost, not the monitoring path's — it exists to verify the
    * sketch bound and is exactly the computation the sketch avoids in
    * production. A monitoring deployment keeps only the O(w·d) sketch and
    * probes candidate keys against it.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sk = cmSketch(ev, "user_id")
    val total = sk.totalCount // the sketch already carries exact N: no second scan
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = top.map { case (uid, exact) =>
      val est = sk.estimateCount(uid)
      (uid, exact, est, est >= exact && est <= exact + (Eps * total).toLong)
    }
    import spark.implicits._
    rows.toSeq.toDF("user_id", "exact_cnt", "cm_estimate", "within_bound")
  }

  /** Two-level HLL distinct-count rollup — incremental cardinality
    * maintenance with Spark's built-in mergeable HyperLogLog sketches:
    * fine-grained (returnflag, linestatus) sketches of the order keys
    * union up to per-returnflag totals via `hll_union_agg`, WITHOUT
    * re-scanning the fact table. The pattern a 100 TB deployment uses for
    * "distinct users per hour, rolled up to day/week": persist the fine
    * sketches once, merge upward forever. The audit emits the union
    * estimate next to a direct per-returnflag sketch estimate and the
    * exact count. NOTE (measured at sf0.01): union and direct estimates
    * do NOT always agree bit-exactly — the union path can promote the
    * sketch's internal mode (sparse→dense) and change the estimator even
    * at the same lgK — so the GUARANTEE gated by the oracle is the error
    * envelope (`union_within_3pct`), and `union_matches_direct` is
    * reported as an observation, not asserted.
    */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val fine = li.groupBy("l_returnflag", "l_linestatus")
      .agg(expr("hll_sketch_agg(l_orderkey, 14)").as("sk"))
    val unioned = fine.groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("union_estimate"))
    val direct = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 14))").as("direct_estimate"),
        countDistinct(col("l_orderkey")).as("exact_distinct"))
    unioned.join(direct, "l_returnflag")
      .withColumn("union_matches_direct",
        col("union_estimate") === col("direct_estimate"))
      // lgConfigK=14 → rse ≈ 0.8%; 3% ≈ >3σ. The flag (not the estimate)
      // is what the DuckDB oracle replays — the driver gate pins the
      // exact counts AND that the sketch stayed in its error envelope at
      // every SF, while the estimate VALUES stay spec-pinned
      // (RangeSketchSpec) because no other engine can reproduce them.
      .withColumn("union_within_3pct",
        abs(col("union_estimate").cast("double") - col("exact_distinct")) <=
          col("exact_distinct") * 0.03)
  }

  /** #232 Persisted HLL sketch INDEX — the incremental complement of
    * [[hllRollup]]: one mergeable (type, day) sketch table built from a
    * single corpus pass, then ANY date-range distinct-count query is a
    * metadata-sized union over the index — the fact table is never
    * rescanned. At 100 TB this is how "distinct users, any window" stays
    * interactive: sketches are a few KB per cell, the index for a year
    * fits in one executor, and HLL union is lossless over identical
    * registers so daily → weekly → monthly rollups all agree.
    */
  def buildHllIndex(spark: SparkSession, dir: String, path: String): Unit =
    Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts DIV 1000) DIV 86400000000").as("day"),
        col("user_id"))
      .groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(path)

  /** Distinct users per type over [fromDay, toDay] answered FROM THE INDEX
    * (partition-prunable day filter + sketch union — no fact scan).
    */
  def hllRangeQuery(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"),
        count(lit(1)).as("n_days"),
        sum(col("n_events")).as("n_events"))

  private val hllIdxMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** Demo query: build (memoized per corpus snapshot) + range-query the
    * middle two weeks of the observation window.
    */
  def hllRangeDemo(spark: SparkSession, dir: String): DataFrame = {
    val path = hllIdxMemo.getOrElseUpdate(
      (dir, graft.Tables.snapshotFingerprint(dir)), {
      val p = java.nio.file.Files.createTempDirectory("hllidx").toString + "/idx"
      buildHllIndex(spark, dir, p)
      p
    })
    // observation-window span FROM THE INDEX (a few hundred rows), not a
    // second full scan of the fact table — round 9 paid an events pass
    // here just for min/max day, which the 1.46× sf0.1 regression traced
    // to. The index's day domain is identical to the fact's by
    // construction (buildHllIndex groups over every event).
    val span = spark.read.parquet(path)
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .head()
    val (d0, d1) = (span.getLong(0), span.getLong(1))
    val mid = (d1 - d0) / 4
    // exact distinct over the same range — the audit cost that makes the
    // row hash-gateable: the oracle replays n_days/n_events/exact_users
    // and pins est_within_3pct TRUE (the estimate itself is Spark-HLL
    // internal and stays spec-pinned, TimeSeriesSpec)
    val exact = Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts DIV 1000) DIV 86400000000").as("day"),
        col("user_id"))
      .filter(col("day").between(d0 + mid, d1 - mid))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    hllRangeQuery(spark, path, d0 + mid, d1 - mid)
      .join(exact, "event_type")
      .withColumn("est_within_3pct",
        abs(col("est_users").cast("double") - col("exact_users")) <=
          col("exact_users") * 0.03)
  }

  /** #321 Sketch-backed DISTINCT-COUNT MV refresh — the
    * `approx_count_distinct` measure [[graft.plans.Mv.refresh]] cannot
    * maintain (sum/count fold under retraction; distinct does not). The
    * summary stores one HLL sketch per group; a delta batch folds in via
    * `hll_union` over DELTA-sized work only. Register-wise max is
    * associative and commutative, so the folded sketch yields the SAME
    * estimate as a from-scratch build over base ∪ delta — est_mismatch
    * is computed from Spark's own two paths and must be 0. Insert-only
    * by nature: HLL cannot retract, deletes force a rebuild (the same
    * caveat as min/max in Mv.refresh, stated rather than hidden).
    *
    * Scale: base is scanned once to SEED the summary (in production the
    * stored sketch table, a few KB per group); each refresh then costs
    * one aggregation of the delta + a group-cardinality merge join.
    */
  def hllMvRefresh(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"))
    val base = ev.filter(col("event_id") % 4 =!= 0)
    val delta = ev.filter(col("event_id") % 4 === 0)
    val baseSk = base.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk_base"))
    val deltaSk = delta.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk_delta"))
    val merged = baseSk.join(deltaSk, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        when(col("sk_base").isNull, col("sk_delta"))
          .when(col("sk_delta").isNull, col("sk_base"))
          .otherwise(expr("hll_union(sk_base, sk_delta)")).as("sk_inc"))
    val full = ev.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk_full"),
        countDistinct(col("user_id")).as("n_exact"))
    merged.join(full, "event_type")
      .select(col("event_type"),
        expr("hll_sketch_estimate(sk_inc)").as("est_incremental"),
        expr("hll_sketch_estimate(sk_full)").as("est_full"),
        col("n_exact"),
        (expr("hll_sketch_estimate(sk_inc)") -
          expr("hll_sketch_estimate(sk_full)")).as("est_mismatch"))
  }
}
