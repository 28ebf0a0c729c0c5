package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event-stream analytics: batch analogs of the reference's monitoring /
  * windowed streaming queries (reference:
  * src/notebooks/demo/cdc_500_tables_streaming.py:366-425). Each is a
  * single-shuffle declarative plan (window functions partitioned by
  * user_id, or one groupBy) — the same code shape Structured Streaming
  * runs incrementally in graft.streaming.CdcStreams.
  */
object Events {

  private val GapUs = 30L * 60 * 1000 * 1000 // 30-minute session gap

  private def withTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ts_us", expr("ts DIV 1000"))

  /** #25 Gap-based sessionization: lag + running-sum-of-new-session-flags,
    * then one aggregate per (user, session). Two window passes over the
    * same (user_id, ts) partitioning — Catalyst reuses the single sort.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeFrom(withTs(spark, dir))

  /** [[sessionize]] over any (user_id, event_id, ts_us, value) frame. */
  private[operators] def sessionizeFrom(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    ev
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        // exact decimal sum (2-dp inputs) -> cross-engine-stable rounding
        round(sum(col("value").cast(DecimalType(12, 2))), 2).cast("double").as("session_value"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
  }

  /** #26 Signup → purchase conversion funnel (single-row summary). */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    withTs(spark, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts_us"))).as("first_signup_us"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("first_purchase_us"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup_us")).as("n_signed_up"),
        count(when(col("first_purchase_us") > col("first_signup_us"), lit(1))).as("n_converted"))

  /** N-step ordered funnel — the generalization of [[funnel]] to any step
    * sequence, with the standard product-analytics semantics: a user's
    * completion time for step i is the EARLIEST step-i event at or after
    * their completion of step i−1 (chained min, inclusive ties). Each
    * stage is one aggregation over only the users still in the funnel, so
    * the N shuffles shrink monotonically; per-stage state is one (user,
    * ts) row — no windows, no per-event state.
    *
    * The result is ONE lazy plan — a union of the per-stage count
    * aggregates — so a single action runs the whole funnel and Spark's
    * ReuseExchange de-duplicates the stage-i shuffle shared by every
    * deeper branch (stage 1's aggregate appears in all N branches but is
    * computed once).
    *
    * Emits one row per depth: step index, step name, users who reached it.
    */
  def funnelSteps(spark: SparkSession, dir: String,
      steps: Seq[String] = Seq("signup", "view", "purchase")): DataFrame =
    funnelStepsOn(withTs(spark, dir).select("user_id", "event_type", "ts_us"), steps)

  /** Core of [[funnelSteps]] over any (user_id, event_type, ts_us) frame —
    * the reusable API shape for callers bringing their own event source.
    */
  def funnelStepsOn(e: DataFrame, steps: Seq[String]): DataFrame = {
    val stageDone: Seq[DataFrame] = steps
      .foldLeft(List.empty[DataFrame]) { case (acc, s) =>
        val cand = e.filter(col("event_type") === s)
        val qualified = acc.headOption match {
          case None => cand
          case Some(prev) =>
            cand.join(prev.select(col("user_id"), col("done").as("prev_done")), "user_id")
              .filter(col("ts_us") >= col("prev_done"))
        }
        qualified.groupBy("user_id").agg(min(col("ts_us")).as("done")) :: acc
      }.reverse
    stageDone.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** #27 Per-user activity profile / lifetime value. */
  def userStats(spark: SparkSession, dir: String): DataFrame =
    withTs(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchases"),
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)).cast(DecimalType(12, 2))), 2).cast("double").as("purchase_value"),
        min(col("ts_us")).as("first_seen_us"),
        max(col("ts_us")).as("last_seen_us"))

  /** #80 Window frames: per-user running cumulative value + 7-event moving
    * average ordered by time (ROWS BETWEEN frames — one shuffle, one sort).
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    withTs(spark, dir)
      .withColumn("cum_value",
        round(sum(col("value").cast(DecimalType(12, 2)))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .cast("double"))
      .withColumn("moving_avg7",
        round(sum(col("value").cast(DecimalType(12, 2)))
          .over(byUser.rowsBetween(-6, Window.currentRow)).cast("double") /
          count(lit(1)).over(byUser.rowsBetween(-6, Window.currentRow)), 4))
      .select("event_id", "user_id", "ts_us", "cum_value", "moving_avg7")
  }

  /** RANGE-frame window: per-user trailing 5-minute activity, keyed by the
    * VALUE of the ordering column (RANGE BETWEEN 300s PRECEDING), not by
    * row position — gaps and same-timestamp ties behave like a real
    * sliding time window, which a ROWS frame cannot express. One shuffle
    * on user_id, one sort; bounded by each user's own history.
    *
    * The frame orders by ts_us ALONE (RANGE requires a single ordering
    * expression); same-timestamp peers aggregate together, so output rows
    * for tied timestamps carry the identical trailing aggregate — safe for
    * the hash-compare because the projected (event_id, trailing_*) pairs
    * are still deterministic.
    */
  def trailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val frame = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-300000000L, Window.currentRow) // 5 min in µs
    withTs(spark, dir)
      .withColumn("trailing_events", count(lit(1)).over(frame))
      .withColumn("trailing_value",
        round(sum(col("value").cast(DecimalType(12, 2))).over(frame), 2)
          .cast("double"))
      .select("event_id", "user_id", "ts_us", "trailing_events", "trailing_value")
  }

  /** #81 NTILE quartiles of event value per type (deterministic: ordered by
    * (value, event_id)) — via [[Distributed.exactNtile]], NOT an
    * `ntile(4) over (partition by event_type)` window: event_type has ~5
    * distinct values and that window funnels all rows through ≤5
    * reducers. The distributed-sort rank is bit-identical to the window
    * at any key cardinality (see Distributed's scaladoc).
    */
  def valueQuartiles(spark: SparkSession, dir: String): DataFrame =
    Distributed.exactNtile(
      withTs(spark, dir).select("event_type", "value", "event_id"),
      keyCols = Seq("event_type"), orderCols = Seq("value", "event_id"),
      n = 4, bucketCol = "quartile")
      .groupBy("event_type", "quartile")
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 2).as("min_v"),
        round(max(col("value")), 2).as("max_v"))

  /** #63 Retention cohorts: users bucketed by signup day, activity counted
    * per days-since-signup offset. Two aggregations, both partial-agg
    * friendly; the cohort key keeps cardinality ≈ days × days.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(expr("ts_us DIV 86400000000")).as("cohort_day"))
    ev.join(signups, "user_id")
      .withColumn("day_offset", expr("ts_us DIV 86400000000") - col("cohort_day"))
      .filter(col("day_offset") >= 0)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("n_events"))
  }

  /** Retention via per-user activity BITMAPS: one 63-bit mask per user
    * (bit k = active on day-offset k from their signup day), built by a
    * single `bit_or(shiftleft(...))` aggregation, then per-offset totals
    * from 63 conditional sums in ONE more aggregation whose shuffle
    * carries 63 counters per partition — `stack` unpivots the single
    * result row.
    *
    * This is the scale shape for retention curves: the cohort-join +
    * `countDistinct` of [[retentionCohorts]] keeps (cohort × offset ×
    * user) rows alive through a distinct aggregation, while the bitmap
    * collapses each user to 8 bytes map-side — the classic roaring-bitmap
    * audience pattern expressed with built-ins. Offsets ≥ 63 fall outside
    * the mask (documented horizon; widen with an array of masks when a
    * >2-month curve matters). Totals equal the distinct-count answer
    * exactly — the oracle computes it the classic way.
    */
  def retentionBitmap(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(expr("ts_us DIV 86400000000")).as("cohort_day"))
    val masks = ev.join(signups, "user_id")
      .withColumn("off", expr("ts_us DIV 86400000000") - col("cohort_day"))
      .filter(col("off") >= 0 && col("off") < 63)
      .groupBy("user_id")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(off AS INT)))").as("mask"))
    val bitSums = (0 until 63).map(k => sum(expr(s"(mask >> $k) & 1")).as(s"d$k"))
    val sums = masks.agg(bitSums.head, bitSums.tail: _*)
    val stackArgs = (0 until 63).map(k => s"CAST($k AS BIGINT), d$k").mkString(", ")
    sums.selectExpr(s"stack(63, $stackArgs) AS (day_offset, active_users)")
      .filter(col("active_users") > 0)
  }

  /** Behavioral transition matrix: counts of consecutive event-type pairs
    * per user journey (lag over the per-user time order), with row-
    * normalized transition probabilities in ×10⁴ fixed point — the
    * first-order Markov view of the event stream that session/funnel
    * queries summarize away. One (user) window pass + one pair aggregate,
    * both map-side-combinable.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val pairs = withTs(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("total", sum(col("n")).over(Window.partitionBy("prev_type")))
      .selectExpr("prev_type", "next_type", "n", "n * 10000 DIV total AS prob_e4")
  }

  /** #283 User-journey trigrams: the 3-step paths [[eventTransitions]]'
    * first-order matrix cannot see (A→B→C vs B→A→C have identical
    * bigrams). Two lags ride the SAME window sort; the pattern frame is
    * ≤ |types|³ rows, so the share arithmetic is exact integers over a
    * bounded aggregate — "what do users actually do" path mining with
    * one corpus exchange.
    */
  def pathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val tri = withTs(spark, dir)
      // both lags in ONE projection -> a single WindowExec over one sort
      .select(col("event_type"),
        lag(col("event_type"), 2).over(w).as("t1"),
        lag(col("event_type"), 1).over(w).as("t2"))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      // the total probe re-references this frame — checkpoint the
      // |types|³-bounded aggregate so the corpus window runs ONCE
      .localCheckpoint()
    val total = tri.agg(sum(col("n")).as("n_total"))
    tri.join(broadcast(total))
      .selectExpr("t1", "t2", "t3", "n", "n * 1000000 DIV n_total AS share_ppm")
  }

  /** Time-to-convert distribution: per converting user, the delay from
    * first signup to first purchase, summarized as exact counts plus
    * interpolated delay percentiles — the funnel's "how long" companion
    * ([[funnel]]/[[funnelSteps]] answer "how many"). Two tiny keyed
    * aggregates join on user_id (broadcastable after aggregation); users
    * whose purchase history starts before their signup (partial capture)
    * are counted separately, not silently dropped.
    */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_us")).as("signup_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts_us")).as("purchase_us"))
    s.join(p, "user_id")
      // sign decided on raw µs, seconds derived only for non-negative
      // deltas: integer division of a NEGATIVE value truncates toward
      // zero here but floors in the oracle engine
      .withColumn("delay_s", expr(
        "CASE WHEN purchase_us >= signup_us THEN (purchase_us - signup_us) DIV 1000000 END"))
      .agg(count(lit(1)).as("n_converted"),
        sum(when(col("delay_s").isNull, 1L).otherwise(0L)).as("n_pre_signup"),
        expr("round(percentile(delay_s, 0.5D), 4)").as("p50_s"),
        expr("round(percentile(delay_s, 0.9D), 4)").as("p90_s"),
        max(col("delay_s")).as("max_s"))
  }

  /** Robust anomaly detection per event type: median / MAD (median
    * absolute deviation) fences instead of mean/stddev — one pathological
    * batch can't drag the threshold the way it drags a z-score. The
    * monitoring companion to [[graft.cdc.Cdc.qualityMetrics]]'s volume
    * flags: `n_outliers` is how many events sit beyond `k`·MAD of their
    * type's median.
    *
    * Three scans, each a partial-aggregated groupBy on event_type (the
    * exact-median passes; swap in [[graft.functions.QuantileSketchAgg]]
    * to fold them into one approximate pass at 100 TB): medians → MAD of
    * deviations → fence counts. Medians/MADs round to 4dp BEFORE the
    * fence comparison, so the flag is a deterministic double comparison
    * against identical inputs in both engines.
    */
  def anomalyMad(spark: SparkSession, dir: String, k: Double = 3.0): DataFrame = {
    val ev = withTs(spark, dir).select("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(expr("round(percentile(value, 0.5D), 4)").as("median_v"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("value") - col("median_v")))
    val mad = dev.groupBy("event_type")
      .agg(expr("round(percentile(absdev, 0.5D), 4)").as("mad_v"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type", "median_v", "mad_v")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("absdev") > lit(k) * col("mad_v"), 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_ratio_e4", expr("n_outliers * 10000 DIV n_events"))
  }

  /** #28 5-minute tumbling window counts per event type — the batch shape of
    * the streaming monitoring query (reference:
    * cdc_500_tables_streaming.py:373-392).
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    withTs(spark, dir)
      .withColumn("tsx", timestamp_micros(col("ts_us")))
      .groupBy(unix_micros(window(col("tsx"), "5 minutes").getField("start"))
          .as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(12, 2))), 2).cast("double").as("sum_value"))

  /** Active-user curve: per calendar day, DAU plus the trailing-7-day WAU
    * and the DAU/WAU stickiness ratio (×10⁴ fixed point). The WAU is NOT a
    * sliding `countDistinct` window (which would re-scan 7 days of events
    * per day): each distinct (user, day) pair fans out map-side to the ≤7
    * future cover days it keeps the user "weekly-active" on, and ONE
    * distinct aggregation per cover day counts the union — the shuffle
    * carries (user, day) pairs ×7, never raw events, and every stage is
    * partial-aggregation friendly. Days are only reported where a DAU
    * exists (inner join), so the frame never invents empty calendar days.
    */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = withTs(spark, dir)
      .select(col("user_id"), expr("ts_us DIV 86400000000").as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("day", explode(sequence(col("day"), col("day") + 6)))
      .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .selectExpr("day", "dau", "wau", "CAST(dau * 10000 DIV wau AS BIGINT) AS stickiness_e4")
  }

  /** Cohort lifetime-value curves: per signup-day cohort × week offset,
    * active users, purchase revenue, and CUMULATIVE revenue — the
    * money-weighted companion of [[retentionCohorts]]. Revenue sums are
    * exact DECIMAL end-to-end; the cumulative window runs over the
    * (cohorts × offsets) frame, which is aggregation OUTPUT (thousands of
    * rows at any corpus size), so the window partition is safe by
    * construction — the corpus-scale work is the two keyed aggregations
    * before it.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(expr("ts_us DIV 86400000000")).as("cohort_day"))
    val weekly = ev.join(cohorts, "user_id")
      // filter on the RAW day offset: pre-signup events must drop before
      // the ÷7 (negative integer division truncates vs floors cross-engine)
      .withColumn("day_off", expr("ts_us DIV 86400000000 - cohort_day"))
      .filter(col("day_off") >= 0)
      .withColumn("week_off", expr("day_off DIV 7"))
      .groupBy("cohort_day", "week_off")
      .agg(countDistinct(col("user_id")).as("n_active_users"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(12, 2))).otherwise(lit(0).cast(DecimalType(12, 2))))
          .as("rev"))
    val w = Window.partitionBy("cohort_day").orderBy("week_off")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum_rev", sum(col("rev")).over(w))
      .select(col("cohort_day"), col("week_off"), col("n_active_users"),
        round(col("rev"), 2).cast("double").as("revenue"),
        round(col("cum_rev"), 2).cast("double").as("cum_revenue"))
  }

  /** Out-of-order arrival audit — the number a streaming deployment sizes
    * its WATERMARK from: per event type, how many events arrived (in
    * event_id order, the binlog-position/arrival proxy) with an event time
    * EARLIER than their predecessor on the same entity, and how large the
    * worst regression is. One per-user window (high-cardinality
    * partition), one aggregate.
    */
  def disorderAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    withTs(spark, dir)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("ts_us") < col("prev_ts"), 1L).otherwise(0L)).as("n_late"),
        expr("sum(CASE WHEN ts_us < prev_ts THEN 1 ELSE 0 END) * 10000" +
          " DIV count(1)").as("late_frac_e4"),
        max(when(col("ts_us") < col("prev_ts"), col("prev_ts") - col("ts_us"))
          .otherwise(0L)).as("max_disorder_us"))
  }

  /** Audience-overlap matrix: for every pair of event types, the exact
    * distinct-user intersection and Jaccard similarity — "do purchasers
    * also refund". The pair fan-out happens per USER from their distinct
    * type set (≤ types² rows per user, map-side after one (type, user)
    * dedup shuffle); nothing joins corpus-to-corpus.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tu = withTs(spark, dir).select("event_type", "user_id").distinct()
    val totals = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = tu.withColumnRenamed("event_type", "type_a")
      .join(tu.withColumnRenamed("event_type", "type_b"), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
    pairs
      .join(totals.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n", "n_a"), "type_a")
      .join(totals.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n", "n_b"), "type_b")
      .selectExpr("type_a", "type_b", "n_a", "n_b", "n_both",
        "n_both * 10000 DIV (n_a + n_b - n_both) AS jaccard_e4")
  }

  /** Longest daily-activity streak per user (gaps-and-islands): distinct
    * active days → row_number per user → group on (day − rn), the
    * constant-per-run island key. Windows partition on user_id (high
    * cardinality — per-task state is one user's days), and the distinct
    * collapse happens BEFORE the window so the sort ranks days, not raw
    * events. The engagement-quality view next to [[retentionBitmap]]'s
    * population curve.
    */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val ud = withTs(spark, dir)
      .select(col("user_id"), expr("ts_us DIV 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy(col("day"))
    ud.withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      .groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        min(col("start_day")).as("first_day"))
  }

  /** #223 RFM segmentation (recency / frequency / monetary quintiles):
    * the classic CRM cut. One events pass reduces to a USER-level frame,
    * then three `Distributed.exactNtile` passes score each axis — each is
    * a distributed range-sort over the user frame (users, not events),
    * never a single-reducer global NTILE window. Ties broken by user_id
    * so the scores are deterministic and the oracle exact.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val usr = withTs(spark, dir)
      .select(col("user_id"), expr("ts_us DIV 86400000000").as("day"), col("value"))
      .groupBy("user_id")
      .agg(max(col("day")).as("r_day"),
        count(lit(1)).as("f_cnt"),
        round(sum(col("value").cast(DecimalType(12, 2))), 2)
          .cast("double").as("m_val"))
    val r = Distributed.exactNtile(usr, Nil, Seq("r_day", "user_id"), 5, "r_q")
    val rf = Distributed.exactNtile(r.select("user_id", "r_day", "f_cnt", "m_val", "r_q"),
      Nil, Seq("f_cnt", "user_id"), 5, "f_q")
    val rfm = Distributed.exactNtile(
      rf.select("user_id", "r_day", "f_cnt", "m_val", "r_q", "f_q"),
      Nil, Seq("m_val", "user_id"), 5, "m_q")
    rfm.select(col("user_id"),
      col("r_q").cast("long").as("r_q"), col("f_q").cast("long").as("f_q"),
      col("m_q").cast("long").as("m_q"),
      concat_ws("-", col("r_q"), col("f_q"), col("m_q")).as("rfm"))
  }

  /** #224 Distribution-drift audit (total-variation distance) between the
    * first and second half of the observation window, per event type —
    * the training-data / metrics drift alarm. TVD computed in EXACT
    * integer arithmetic: Σ|c₁·n₂ − c₂·n₁|·10⁴ ÷ (2·n₁·n₂) over equi-width
    * value buckets, so the number is bit-identical on any engine. One
    * events shuffle on (type, era, bucket) + a broadcast-sized
    * profile join.
    */
  def driftTv(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = withTs(spark, dir)
      .select(col("event_type"), expr("ts_us DIV 86400000000").as("day"),
        least(greatest(floor(col("value") / 50.0), lit(0.0)), lit(19.0))
          .cast("long").as("bucket"))
    val mid = bucketed.agg(expr("(min(day) + max(day) + 1) DIV 2").as("mid"))
    // era folds into CONDITIONAL aggregation: one (type, bucket) shuffle
    // carries both halves as columns — no per-era branch, no full-outer
    // alignment join, no recomputed scan
    val cells = bucketed.crossJoin(broadcast(mid))
      .groupBy("event_type", "bucket")
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("c2"))
    // era totals ride a window over the (types × buckets)-sized aggregate
    val wt = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("n1", sum(col("c1")).over(wt))
      .withColumn("n2", sum(col("c2")).over(wt))
      .groupBy("event_type")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("num"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("event_type"), col("n1"), col("n2"),
        expr("num * 10000 DIV (2 * n1 * n2)").cast("long").as("tvd_e4"))
  }

  /** #245 Winsorization audit (P1/P99 capping — the feature-cleaning
    * pass before model training): per-type thresholds picked by EXACT
    * integer rank ((n+99) DIV 100 and (99n+99) DIV 100 over the
    * distributed rank — no FP quantile boundary fuzz, the oracle
    * replicates the same rank arithmetic), then capped-vs-raw moments in
    * exact decimals. Ranking rides [[Distributed.exactRank]] (range
    * partition, never a per-type reducer); thresholds broadcast back.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(12, 2)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), round(col("value"), 2).as("value"))
    val ranked = Distributed.exactRank(ev, Seq("event_type"),
      Seq("value", "event_id"))
    val thresholds = ranked
      .filter(col("rnk") === expr("(n_total + 99) DIV 100") ||
        col("rnk") === expr("(99 * n_total + 99) DIV 100"))
      .groupBy("event_type")
      .agg(min(when(col("rnk") === expr("(n_total + 99) DIV 100"), col("value"))).as("lo"),
        min(when(col("rnk") === expr("(99 * n_total + 99) DIV 100"), col("value"))).as("hi"))
    ev.join(broadcast(thresholds), "event_type")
      .withColumn("capped", least(greatest(col("value"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(round(max(col("lo")), 2).as("lo"), round(max(col("hi")), 2).as("hi"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_capped_low"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_capped_high"),
        round(sum(col("value").cast(d)).cast("double") / count(lit(1)), 4)
          .as("mean_before"),
        round(sum(col("capped").cast(d)).cast("double") / count(lit(1)), 4)
          .as("mean_after"))
  }

  /** #236 Linear multi-touch attribution: every purchase's value split
    * EXACTLY (integer cents, remainder to the earliest touch) across the
    * user's view/click touches in the preceding 7 days — the
    * marketing-mix counterpart of the as-of join's last-touch. Shape:
    * per-purchase touch counts ride ONE user-partitioned RANGE window
    * over the interleaved event stream (no join to count); the
    * credit assignment is an equi-join on user_id with the time window
    * as a residual — per-key work bounded by touches×purchases inside
    * 7 days, the same bounded-interval shape as the PIT join.
    * Cents arithmetic makes the split lossless: Σ credits == purchase
    * cents, bit-identical on any engine.
    */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 7L * 86400000000L
    val ev = withTs(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val isTouch = col("event_type").isin("view", "click")
    // touches per purchase: RANGE frame over the interleaved stream —
    // count touch rows in (t-7d, t]; purchases exclude themselves by type
    val wRange = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-WindowUs, 0)
    val purchases = ev
      .withColumn("n_touch", sum(when(isTouch, 1L).otherwise(0L)).over(wRange))
      .filter(col("event_type") === "purchase" && col("n_touch") > 0)
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts_us").as("p_ts"), col("cents"), col("n_touch"))
    val touches = ev.filter(isTouch)
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("touch_type"), col("ts_us").as("t_ts"))
    val joined = purchases.join(touches, "user_id")
      .filter(col("t_ts") >= col("p_ts") - WindowUs && col("t_ts") <= col("p_ts"))
    // earliest touch per purchase carries the integer-division remainder
    val wp = Window.partitionBy("p_id").orderBy(col("t_ts"), col("t_id"))
    joined
      .withColumn("rn", row_number().over(wp))
      .withColumn("credit",
        expr("cents DIV n_touch") +
          when(col("rn") === 1, expr("cents % n_touch")).otherwise(0L))
      .groupBy("touch_type")
      .agg(countDistinct(col("t_id")).as("n_touches_credited"),
        count(lit(1)).as("n_credits"),
        round(sum(col("credit")).cast(org.apache.spark.sql.types.DecimalType(18, 0))
          .cast("double") / 100.0, 2).as("attributed_value"))
  }

  /** #264 Attribution-model comparison: the same touch⋈purchase frame as
    * [[attributionLinear]] credited under FOUR models side by side —
    * linear, first-touch, last-touch, and U-shaped position (40/20/40,
    * the standard position-based model) — so marketing sees how much the
    * model CHOICE moves each channel before anyone argues about the
    * numbers. Every model is exact integer cents with the division
    * remainder pinned to the earliest touch, so each model conserves
    * every purchase's value to the cent and the whole comparison
    * hash-replays cross-engine. One extra projection over the linear
    * plan — same joins, same windows, zero additional shuffles.
    */
  def attributionCompare(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 7L * 86400000000L
    val ev = withTs(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val isTouch = col("event_type").isin("view", "click")
    val wRange = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-WindowUs, 0)
    val purchases = ev
      .withColumn("n_touch", sum(when(isTouch, 1L).otherwise(0L)).over(wRange))
      .filter(col("event_type") === "purchase" && col("n_touch") > 0)
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts_us").as("p_ts"), col("cents"), col("n_touch"))
    val touches = ev.filter(isTouch)
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("touch_type"), col("ts_us").as("t_ts"))
    val wp = Window.partitionBy("p_id").orderBy(col("t_ts"), col("t_id"))
    val f40 = "cents * 40 DIV 100"
    val mid = s"(cents - 2 * ($f40)) DIV (n_touch - 2)"
    purchases.join(touches, "user_id")
      .filter(col("t_ts") >= col("p_ts") - WindowUs && col("t_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(wp))
      .withColumn("linear_c",
        expr("cents DIV n_touch") +
          when(col("rn") === 1, expr("cents % n_touch")).otherwise(0L))
      .withColumn("first_c", when(col("rn") === 1, col("cents")).otherwise(0L))
      .withColumn("last_c", when(col("rn") === col("n_touch"), col("cents")).otherwise(0L))
      .withColumn("position_c", expr(
        "CASE WHEN n_touch = 1 THEN cents " +
          "WHEN n_touch = 2 THEN CASE WHEN rn = 1 THEN cents - cents DIV 2 ELSE cents DIV 2 END " +
          s"ELSE CASE WHEN rn = 1 THEN $f40 + (cents - 2 * ($f40) - (n_touch - 2) * ($mid)) " +
          s"WHEN rn = n_touch THEN $f40 ELSE $mid END END"))
      .groupBy("touch_type")
      .agg(sum(col("linear_c")).as("linear_cents"),
        sum(col("first_c")).as("first_cents"),
        sum(col("last_c")).as("last_cents"),
        sum(col("position_c")).as("position_cents"))
  }

  /** #233 Kolmogorov–Smirnov two-sample drift statistic per event type —
    * the CDF-based complement of [[driftTv]]'s binned TVD (KS catches
    * location/shape shifts that coarse bins smear). EXACT integer
    * arithmetic: D = max over observed values of |cum₁·n₂ − cum₂·n₁|,
    * reported ×10⁴ ÷ n₁n₂ — bit-identical cross-engine. Values quantize
    * to cents, so the per-type CDF frame is bounded by the VALUE DOMAIN
    * (≤ ~40k distinct cents here), never by the event count — the
    * cumulative window over it is safe at any corpus size even though it
    * partitions by type.
    */
  def driftKs(spark: SparkSession, dir: String): DataFrame = {
    val cents = withTs(spark, dir)
      .select(col("event_type"), expr("ts_us DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val mid = cents.agg(expr("(min(day) + max(day) + 1) DIV 2").as("mid"))
    val cells = cents.crossJoin(broadcast(mid))
      .groupBy("event_type", "v")
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("c2"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .withColumn("n1", sum(col("c1")).over(wt))
      .withColumn("n2", sum(col("c2")).over(wt))
      .groupBy("event_type")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("dmax"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("event_type"), col("n1"), col("n2"),
        expr("dmax * 10000 DIV (n1 * n2)").cast("long").as("ks_e4"))
  }

  /** #225 Two-sample A/B readout: deterministic 50/50 split on user_id
    * parity, high-value-purchase conversion per arm, pooled
    * two-proportion z-score. Conversion ratios are exact integers (ppm);
    * only the final z crosses doubles, and every step (divide, sqrt) is
    * IEEE correctly-rounded so round(…,4) is engine-stable; a degenerate
    * pooled variance (0% or 100% overall) yields NULL, not an error.
    * One events pass + a 2-row reduction.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(spark, dir)
      .groupBy((col("user_id") % 2).cast("long").as("arm"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("event_type") === "purchase" && col("value") >= 80.0,
          col("user_id"))).as("n_converted"))
    val wide = arms.agg(
      max(when(col("arm") === 0, col("n_users"))).as("n_a"),
      max(when(col("arm") === 0, col("n_converted"))).as("conv_a"),
      max(when(col("arm") === 1, col("n_users"))).as("n_b"),
      max(when(col("arm") === 1, col("n_converted"))).as("conv_b"))
    val num = col("conv_a").cast("double") / col("n_a") -
      col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
    val den = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      expr("conv_a * 1000000 DIV n_a").as("conv_a_ppm"),
      expr("conv_b * 1000000 DIV n_b").as("conv_b_ppm"),
      when(den === 0.0, lit(null).cast("double"))
        .otherwise(round(num / den, 4)).as("z_score"))
  }

  /** #355 Sequential A/B monitor — always-valid inference for the running
    * experiment [[abTest]] reads once: per-day looks at the purchase-value
    * metric under the mSPRT normal-mixture log-likelihood ratio (Johari
    * et al., KDD'17 shape): with per-arm cumulative mean/variance,
    * se² = v_a/n_a + v_b/n_b, θ̂ = mean_b − mean_a, prior τ² = 100
    * (τ = $10 effect scale),
    * llr = ½·ln(se²/(se²+τ²)) + θ̂²τ²/(2·se²·(se²+τ²)); the
    * always-valid p-value is exp(−max llr so far) capped at 1, and the
    * experiment is significant once that running max crosses ln(1/α),
    * α = 0.05 — valid at EVERY look, no peeking penalty.
    *
    * Scale: one corpus aggregate to (day, arm) — everything after is
    * calendar-sized (the [[burnRate]] shape). Determinism: values enter
    * as exact integer cents (floor(v·100+0.5) per row), cumulative sums
    * are exact integers (cents² in DECIMAL(38,0) ↔ DuckDB HUGEINT), and
    * the float stats are computed by the IDENTICAL expression text on
    * both engines from those exact integers, then rounded ×10⁴.
    */
  def sequentialAb(spark: SparkSession, dir: String): DataFrame = {
    val pe = withTs(spark, dir)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id % 2 AS arm", "ts_us DIV 86400000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c")
    val daily = pe.groupBy("day", "arm").agg(count(lit(1)).as("n"),
      sum(col("v_c")).as("s1"),
      sum(expr("CAST(v_c AS DECIMAL(38,0)) * v_c")).as("s2"))
    val grid = pe.select("day").distinct()
      .crossJoin(spark.range(2).select(col("id").as("arm")))
      .join(daily, Seq("day", "arm"), "left")
      .selectExpr("day", "arm", "coalesce(n, 0) AS n", "coalesce(s1, 0) AS s1",
        "coalesce(s2, CAST(0 AS DECIMAL(38,0))) AS s2")
    val w = Window.partitionBy("arm").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.select(col("day"), col("arm"),
      sum("n").over(w).as("cn"), sum("s1").over(w).as("cs1"),
      sum("s2").over(w).as("cs2"))
    val wide = cum.groupBy("day").agg(
      max(when(col("arm") === 0, col("cn"))).as("cn_a"),
      max(when(col("arm") === 0, col("cs1"))).as("cs1_a"),
      max(when(col("arm") === 0, col("cs2"))).as("cs2_a"),
      max(when(col("arm") === 1, col("cn"))).as("cn_b"),
      max(when(col("arm") === 1, col("cs1"))).as("cs1_b"),
      max(when(col("arm") === 1, col("cs2"))).as("cs2_b"))
    // identical expression TEXT to the DuckDB oracle — float ops on the
    // same exact-integer inputs in the same order are IEEE-deterministic
    val st = wide.selectExpr("day", "cn_a", "cn_b",
      "CAST(cs1_a AS DOUBLE) / cn_a / 100.0 AS mean_a",
      "CAST(cs1_b AS DOUBLE) / cn_b / 100.0 AS mean_b",
      "(CAST(cs2_a AS DOUBLE) / 10000.0 - cn_a * (CAST(cs1_a AS DOUBLE) / cn_a / 100.0) * (CAST(cs1_a AS DOUBLE) / cn_a / 100.0)) / (cn_a - 1) AS var_a",
      "(CAST(cs2_b AS DOUBLE) / 10000.0 - cn_b * (CAST(cs1_b AS DOUBLE) / cn_b / 100.0) * (CAST(cs1_b AS DOUBLE) / cn_b / 100.0)) / (cn_b - 1) AS var_b")
    val llr = st.selectExpr("day", "cn_a", "cn_b", "mean_a", "mean_b",
      """CASE WHEN cn_a >= 2 AND cn_b >= 2
           AND var_a / cn_a + var_b / cn_b > 0 THEN
         0.5 * ln((var_a / cn_a + var_b / cn_b) / (var_a / cn_a + var_b / cn_b + 100.0))
         + (mean_b - mean_a) * (mean_b - mean_a) * 100.0
           / (2.0 * (var_a / cn_a + var_b / cn_b) * (var_a / cn_a + var_b / cn_b + 100.0))
         END AS llr""")
    val wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    llr.withColumn("max_llr", max(col("llr")).over(wd))
      .selectExpr("day", "cn_a AS n_a", "cn_b AS n_b",
        "round(mean_a, 4) AS mean_a_r", "round(mean_b, 4) AS mean_b_r",
        "round(llr, 4) AS llr_r",
        "round(least(1.0, exp(-max_llr)), 4) AS pval_r",
        "CAST(CASE WHEN max_llr > ln(20.0) THEN 1 ELSE 0 END AS BIGINT) AS signif")
  }

  /** #356 Power analysis for the running experiment: from the observed
    * per-arm purchase-value variance, (a) the minimum detectable effect
    * at the CURRENT sample size and (b) the per-arm sample size required
    * to detect a 1%-of-mean lift — both at α = 0.05 two-sided, power
    * 0.8 (z constants 1.959964 + 0.841621 as shared literals). The
    * "should we keep running?" readout next to [[abTest]] (point
    * estimate) and [[sequentialAb]] (always-valid monitor):
    * mde = (z_α/2+z_β)·√(σ²_a/n_a + σ²_b/n_b), n_req = 2σ̄²(z_α/2+z_β)²/δ².
    *
    * One corpus aggregate; determinism as [[sequentialAb]]: exact integer
    * cents/cents² sums, float stats via identical expression text both
    * engines, rounded outputs.
    */
  def powerMde(spark: SparkSession, dir: String): DataFrame = {
    val pe = withTs(spark, dir)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id % 2 AS arm",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c")
    val arms = pe.groupBy("arm").agg(count(lit(1)).as("n"),
      sum(col("v_c")).as("s1"),
      sum(expr("CAST(v_c AS DECIMAL(38,0)) * v_c")).as("s2"))
    val wide = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_a"),
      max(when(col("arm") === 0, col("s1"))).as("s1_a"),
      max(when(col("arm") === 0, col("s2"))).as("s2_a"),
      max(when(col("arm") === 1, col("n"))).as("n_b"),
      max(when(col("arm") === 1, col("s1"))).as("s1_b"),
      max(when(col("arm") === 1, col("s2"))).as("s2_b"))
    wide.selectExpr("n_a", "n_b",
        "CAST(s1_a AS DOUBLE) / n_a / 100.0 AS mean_a",
        "CAST(s1_b AS DOUBLE) / n_b / 100.0 AS mean_b",
        "(CAST(s1_a AS DOUBLE) + s1_b) / (n_a + n_b) / 100.0 AS mean_p",
        "(CAST(s2_a AS DOUBLE) / 10000.0 - n_a * (CAST(s1_a AS DOUBLE) / n_a / 100.0) * (CAST(s1_a AS DOUBLE) / n_a / 100.0)) / (n_a - 1) AS var_a",
        "(CAST(s2_b AS DOUBLE) / 10000.0 - n_b * (CAST(s1_b AS DOUBLE) / n_b / 100.0) * (CAST(s1_b AS DOUBLE) / n_b / 100.0)) / (n_b - 1) AS var_b")
      .selectExpr("n_a", "n_b",
        "round(mean_a, 4) AS mean_a_r", "round(mean_b, 4) AS mean_b_r",
        "round(sqrt(var_a), 4) AS sd_a_r", "round(sqrt(var_b), 4) AS sd_b_r",
        // MDE at the current n
        "round((1.959964 + 0.841621) * sqrt(var_a / n_a + var_b / n_b), 4) AS mde_abs_r",
        // MDE relative to the pooled mean, in basis points
        "CAST(floor((1.959964 + 0.841621) * sqrt(var_a / n_a + var_b / n_b) / mean_p * 10000 + 0.5) AS BIGINT) AS mde_rel_bp",
        // per-arm n to detect a 1%-of-pooled-mean lift (pooled variance)
        "CAST(ceil(2.0 * ((var_a * (n_a - 1) + var_b * (n_b - 1)) / (n_a + n_b - 2)) * (1.959964 + 0.841621) * (1.959964 + 0.841621) / (mean_p * 0.01 * mean_p * 0.01)) AS BIGINT) AS n_req_1pct")
  }

  /** #362 Period-over-period revenue decomposition: split the event-time
    * range at its midpoint (the [[graft.cdc.Cdc]] incremental-snapshot
    * convention, so the oracle replays the identical split) and explain
    * each segment's revenue delta as VOLUME effect (count moved at the
    * old rate) + RATE effect (new count at the rate change):
    * Δ = (n_B − n_A)·r_A + n_B·(r_B − r_A), which telescopes exactly to
    * rev_B − rev_A per segment. The standard mix-shift readout — "did
    * revenue move because we got more events or richer events?" — per
    * event-type segment.
    *
    * One corpus aggregate to (segment, period); everything after is
    * segment-sized. Values enter as exact integer cents; the two effect
    * terms are rational (they divide by n_A) and ship as
    * floor(x+0.5)-rounded cents computed by identical expression text on
    * both engines. A segment absent in period A attributes its whole
    * revenue to volume (r_A defined 0).
    */
  def revenueDecomp(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir)
      .select(col("event_type"), col("ts_us"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v_c"))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("t_mid"))
    val cells = ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"))
      .agg(sum(when(col("ts_us") <= col("t_mid"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("ts_us") <= col("t_mid"), col("v_c")).otherwise(0L)).as("rev_a_c"),
        sum(when(col("ts_us") > col("t_mid"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("ts_us") > col("t_mid"), col("v_c")).otherwise(0L)).as("rev_b_c"))
    cells.selectExpr("event_type", "n_a", "n_b", "rev_a_c", "rev_b_c",
      "rev_b_c - rev_a_c AS delta_c",
      """CASE WHEN n_a = 0 THEN rev_b_c
         ELSE CAST(floor((n_b - n_a) * (CAST(rev_a_c AS DOUBLE) / n_a) + 0.5) AS BIGINT)
         END AS volume_eff_c""",
      """CASE WHEN n_a = 0 THEN CAST(0 AS BIGINT)
         WHEN n_b = 0 THEN CAST(0 AS BIGINT)
         ELSE CAST(floor(n_b * (CAST(rev_b_c AS DOUBLE) / n_b - CAST(rev_a_c AS DOUBLE) / n_a) + 0.5) AS BIGINT)
         END AS rate_eff_c""")
  }

  /** #247 Interval union (gaps-and-islands overlap merge): each event is
    * an activity interval `[ts, ts + value seconds)` and the per-user
    * union of those intervals is the user's true covered wall-clock —
    * the "total online time" query that naive `sum(duration)` gets wrong
    * whenever activities overlap.
    *
    * Shape: the classic cumulative-max island detector — an interval
    * starts a new island iff its start exceeds the running max end of
    * everything before it. Both window passes and the island aggregate
    * share ONE (user_id)-hash partitioning, so the whole operator is a
    * single exchange at any scale; per-user state is a sort, never a
    * materialized island list. Endpoint arithmetic stays in integer
    * microseconds (`floor(value*1e6)` — floor, not cast, because engines
    * disagree on double→int rounding) so results are bit-identical
    * cross-engine.
    */
  /** #255 Watermark sizing advice: per event type, exact integer-rank
    * P50/P95/P99/max of the out-of-order delay — how far behind the
    * running per-user max timestamp a late event arrives (arrival order
    * = event_id, same convention as [[disorderAudit]]). `wm_advice_us`
    * is the P99: the watermark that admits 99% of late data. Ranks ride
    * [[Distributed.exactRank]] (range repartition + broadcast offsets —
    * no per-type single-reducer window), the same ceil-rank arithmetic
    * as [[winsorize]] so the oracle replays it integer-for-integer.
    */
  def watermarkAdvice(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = withTs(spark, dir)
      .withColumn("prev_max", max(col("ts_us")).over(w))
      .select(col("event_type"), col("event_id"),
        greatest(lit(0L), coalesce(col("prev_max") - col("ts_us"), lit(0L))).as("late_us"))
    val ranked = Distributed.exactRank(late, Seq("event_type"), Seq("late_us", "event_id"))
    ranked.groupBy("event_type")
      .agg(max(col("n_total")).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        min(when(col("rnk") === expr("(50 * n_total + 99) DIV 100"), col("late_us"))).as("p50_us"),
        min(when(col("rnk") === expr("(95 * n_total + 99) DIV 100"), col("late_us"))).as("p95_us"),
        min(when(col("rnk") === expr("(99 * n_total + 99) DIV 100"), col("late_us"))).as("p99_us"),
        max(col("late_us")).as("max_us"))
      .withColumn("wm_advice_us", col("p99_us"))
  }

  /** The watermark candidates [[watermarkImpact]] prices, label → µs. */
  final val WatermarkCandidates: Seq[(String, Long)] = Seq(
    "1s" -> 1000000L, "1m" -> 60000000L, "1h" -> 3600000000L,
    "1d" -> 86400000000L)

  /** #286 Watermark impact pricing: [[watermarkAdvice]] says how late the
    * tail is; this says what each CANDIDATE watermark would have COST —
    * events arriving later than W after already-seen data are dropped by
    * a W watermark, so per (type, W): dropped count, exact dropped ppm,
    * and the dropped value mass in cents. All four candidates fold as
    * conditional sums in ONE aggregation over one lateness window (the
    * per-candidate rows stack off the aggregate — the corpus is never
    * fanned out ×4). The business-facing readout that turns the P99
    * advice into an explicit correctness-vs-latency trade.
    */
  def watermarkImpact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = withTs(spark, dir)
      .withColumn("prev_max", max(col("ts_us")).over(w))
      .select(col("event_type"),
        greatest(lit(0L), coalesce(col("prev_max") - col("ts_us"), lit(0L)))
          .as("late_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val aggs = WatermarkCandidates.flatMap { case (lbl, us) => Seq(
      sum(when(col("late_us") > us, 1L).otherwise(0L)).as(s"n_$lbl"),
      sum(when(col("late_us") > us, col("cents")).otherwise(0L)).as(s"c_$lbl")) }
    val folded = late.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), aggs: _*)
    val stackArgs = WatermarkCandidates.map { case (lbl, us) =>
      s"'$lbl', CAST($us AS BIGINT), n_$lbl, c_$lbl" }.mkString(", ")
    folded.selectExpr("event_type", "n_events",
      s"stack(${WatermarkCandidates.size}, $stackArgs) " +
        "AS (wm_label, wm_us, n_dropped, cents_dropped)")
      .withColumn("dropped_ppm", expr("n_dropped * 1000000 DIV n_events"))
  }

  /** DuckDB oracle for [[watermarkImpact]], generated from the same
    * candidate list. */
  def watermarkImpactOracle: String = {
    val sums = WatermarkCandidates.map { case (lbl, us) =>
      s"""    CAST(sum(CASE WHEN late_us > $us THEN 1 ELSE 0 END) AS BIGINT) AS n_$lbl,
         |    CAST(sum(CASE WHEN late_us > $us THEN cents ELSE 0 END) AS BIGINT) AS c_$lbl""".stripMargin
    }.mkString(",\n")
    val legs = WatermarkCandidates.map { case (lbl, us) =>
      s"""SELECT event_type, n_events, '$lbl' AS wm_label,
         |  CAST($us AS BIGINT) AS wm_us, n_$lbl AS n_dropped,
         |  c_$lbl AS cents_dropped,
         |  CAST(n_$lbl * 1000000 // n_events AS BIGINT) AS dropped_ppm FROM f""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH l AS (SELECT event_type,
       |    greatest(0, COALESCE(max(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      - epoch_us(ts), 0)) AS late_us,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |f AS (SELECT event_type, count(*) AS n_events,
       |$sums
       |  FROM l GROUP BY 1)
       |$legs""".stripMargin
  }

  /** #256 Hour-of-day load profile: event share per UTC hour with the
    * signed deviation from the uniform 1/24 share, in exact ppm — the
    * capacity-planning / anomaly baseline for ingest scheduling. One
    * 24-row aggregate; BIGINT arithmetic is exact to ~10¹² events per
    * hour bucket.
    */
  def hourProfile(spark: SparkSession, dir: String): DataFrame = {
    val h = withTs(spark, dir)
      .select(expr("(ts_us DIV 3600000000) % 24").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("n_events"))
    val tot = h.agg(sum(col("n_events")).as("total"))
    h.crossJoin(broadcast(tot))
      .select(col("hour"), col("n_events"),
        expr("n_events * 1000000 DIV total").as("share_ppm"),
        expr("n_events * 1000000 DIV total - 1000000 DIV 24").as("dev_ppm"))
  }

  /** #257 CUPED variance-reduced A/B readout (Deng et al., WSDM'13): the
    * post-period arm difference adjusted by the pre-period covariate,
    * θ = cov(pre, post)/var(pre) pooled across arms. Pre/post split at
    * the observation-window midpoint (same convention as [[driftTv]]),
    * arms on user_id parity (same as [[abTest]]). All sums are exact
    * integers/decimals — per-user cents, DECIMAL(38,0) cross-products —
    * and every float expression is written in the SAME SQL text the
    * oracle runs (divide and round only, both IEEE-stable), so θ, the
    * raw/adjusted diffs, and ρ² hash-match cross-engine. ρ² is the
    * variance fraction CUPED removes. One user-level shuffle + a 1-row
    * reduction.
    */
  def cupedAb(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir).select(col("user_id"),
      expr("ts_us DIV 86400000000").as("day"),
      expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) DIV 2").as("mid"))
    val per = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(when(col("day") < col("mid"), col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day") >= col("mid"), col("cents")).otherwise(0L)).as("y"))
      .withColumn("arm", expr("user_id % 2"))
    per.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).cast(DecimalType(38, 0)).as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).cast(DecimalType(38, 0)).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast(DecimalType(38, 0)).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast(DecimalType(38, 0)).as("syy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast(DecimalType(38, 0)).as("sxy"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx_a"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx_b"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy_b"))
    .selectExpr("n_a", "n_b",
      "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS theta",
      "round(CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b, 4) AS raw_diff_cents",
      "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE round(CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b), 4) END AS adj_diff_cents",
      "CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 4) END AS rho2")
  }

  /** #252 Exact distributed higher moments: per-type skewness and excess-
    * free kurtosis computed from INTEGER power sums of deviations about
    * the integer-cent mean (two passes: a cents mean that broadcasts
    * back, then one aggregation of d², d³, d⁴ as DECIMAL(38,0) — d is
    * bounded by the value range, so the decimal sums are exact at any
    * row count where d⁴·n < 10³⁸, i.e. far past 100 TB). The only
    * floating point is the final ratio, written with `sqrt` (correctly
    * rounded per IEEE, unlike `pow`) in the SAME expression text the
    * oracle runs — so the rounded result is bit-identical cross-engine.
    * The naive one-pass Σx⁴ formulation would need the full 38 digits at
    * a million rows and suffer catastrophic cancellation; deviations
    * about the mean keep magnitudes small and the subtraction exact.
    */
  def moments(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(floor(value * 100) AS BIGINT)").as("c"))
    val mu = ev.groupBy("event_type")
      .agg(expr("sum(c) DIV count(1)").as("mu_cents"), count(lit(1)).as("n"))
    ev.join(broadcast(mu), "event_type")
      .withColumn("dv", expr("CAST(c - mu_cents AS DECIMAL(38,0))"))
      .groupBy("event_type")
      .agg(max(col("n")).as("n"), max(col("mu_cents")).as("mu_cents"),
        sum(expr("dv * dv")).cast(DecimalType(38, 0)).as("s2"),
        sum(expr("dv * dv * dv")).cast(DecimalType(38, 0)).as("s3"),
        sum(expr("dv * dv * dv * dv")).cast(DecimalType(38, 0)).as("s4"))
      // the raw power sums are 38-digit integers: too wide for int64, and
      // Decimal objects are dtype-unstable across the oracle harness's
      // pandas bridge — ship them as STRINGS (exact, hash-identical on
      // both engines); the float ratios are computed from the decimals
      // BEFORE the cast so precision is untouched.
      .selectExpr("event_type", "n", "mu_cents",
        "CAST(s2 AS STRING) AS s2", "CAST(s3 AS STRING) AS s3", "CAST(s4 AS STRING) AS s4",
        "CASE WHEN s2 = 0 THEN NULL ELSE round(CAST(s3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) / (CAST(s2 AS DOUBLE) * sqrt(CAST(s2 AS DOUBLE))), 4) END AS skewness",
        "CASE WHEN s2 = 0 THEN NULL ELSE round(CAST(n AS DOUBLE) * CAST(s4 AS DOUBLE) / (CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)), 4) END AS kurtosis")
  }

  /** #253 Deterministic per-type mode: the most frequent integer value
    * bucket with smallest-bucket tie-break — `max_by` over a key struct
    * that is unique per candidate, so the argmax replays anywhere. Two
    * shrinking aggregations, no window.
    */
  def valueMode(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(floor(value) AS BIGINT)").as("v"))
      .groupBy("event_type", "v").agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(max_by(struct(col("v"), col("cnt")), struct(col("cnt"), -col("v"))).as("m"),
        count(lit(1)).as("n_distinct_buckets"))
      .select(col("event_type"), col("m.v").as("mode_v"),
        col("m.cnt").as("n_mode"), col("n_distinct_buckets"))

  /** #251 Revenue-concentration (Pareto) audit: for each coverage target
    * (50/80/90/99% of total event value), the minimal number of
    * top-spending users that reaches it and the exact share they cover —
    * the "how top-heavy is this corpus" readout that sizes skew
    * mitigation before a per-user join.
    *
    * Exact integer arithmetic end-to-end: per-user totals in cents, the
    * global running total via [[Distributed.exactCumSum]] (range
    * repartition + broadcast per-partition offsets — never a
    * single-reducer global window), and threshold tests as cross-
    * multiplied integer comparisons. The 4 threshold rows fan out from a
    * broadcast literal frame, so the user-sized frame is scanned once.
    */
  def paretoShare(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
      .withColumn("neg_cents", -col("cents"))
    val cum = Distributed.exactCumSum(totals, Seq("neg_cents", "user_id"), "cents")
    val grand = cum.agg(max(col("cum")).as("total_cents"))
    cum.crossJoin(broadcast(grand))
      .crossJoin(broadcast(
        cum.sparkSession.range(0, 1).selectExpr("explode(array(50L, 80L, 90L, 99L)) AS pct")))
      .groupBy("pct")
      .agg(
        max(col("total_cents")).as("total_cents"),
        sum(when((col("cum") - col("cents")) * 100 < col("pct") * col("total_cents"), 1L)
          .otherwise(0L)).as("n_top_users"),
        min(when(col("cum") * 100 >= col("pct") * col("total_cents"), col("cum")))
          .as("covered_cents"))
      .select(col("pct"), col("n_top_users"),
        col("covered_cents"),
        expr("covered_cents * 1000000 DIV total_cents").as("covered_ppm"))
  }

  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val iv = withTs(spark, dir).select(
      col("user_id"), col("event_id"), col("ts_us").as("s_us"),
      (col("ts_us") + floor(col("value") * lit(1000000.0)).cast("long")).as("e_us"))
    val w = Window.partitionBy("user_id").orderBy(col("s_us"), col("e_us"), col("event_id"))
    val islands = iv
      .withColumn("prev_max_e",
        max(col("e_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max_e").isNull || col("s_us") > col("prev_max_e"), 1).otherwise(0))
      .withColumn("island", sum(col("is_new")).over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_raw"), min(col("s_us")).as("s"), max(col("e_us")).as("e"))
    islands.groupBy("user_id")
      .agg(sum(col("n_raw")).as("n_events"),
        count(lit(1)).as("n_intervals"),
        sum(col("e") - col("s")).as("covered_us"),
        max(col("e") - col("s")).as("longest_us"))
  }

  /** #282 Time-weighted average value per user: each event's value holds
    * until the next event, so the mean weights by HOLD DURATION, not by
    * event count — the correct average for state-like metrics (a price
    * that sat for an hour counts 3600× a one-second blip; the unweighted
    * mean a dashboard naively computes over-counts rapid flappers).
    * Numerator Σ cents·gap_us and denominator Σ gap_us are exact
    * DECIMAL(38,0)/bigint sums; the single divide runs in identical SQL
    * text on both engines. Lead window and aggregate share ONE user_id
    * exchange; users with a single event (no held interval) report NULL.
    */
  def timeWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("gap_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("gap_us")).as("held_us"),
        expr("sum(CAST(cents AS DECIMAL(38,0)) * gap_us)").as("num"))
      .select(col("user_id"), col("n_intervals"), col("held_us"),
        expr("CASE WHEN held_us = 0 THEN NULL ELSE " +
          "round(CAST(num AS DOUBLE) / CAST(held_us AS DOUBLE) / 100.0, 4) " +
          "END").as("twa_value"))
  }

  /** #274 Growth accounting — the daily new/returning split every DAU
    * dashboard starts from: an active user is NEW on their first-ever
    * active day, RETURNING after. (user, day) distinct and the per-user
    * first day share one user-side hash partitioning (no second
    * exchange); the day-level rollup and the cumulative-users running
    * sum act on a calendar-bounded frame, so the global window is over
    * days, never users.
    */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    // ONE user exchange: collect_set(day) folds each user's activity to a
    // calendar-bounded array (≤ days in window, map-side combined), and
    // first_day/active-day fan-out both derive from it locally — the
    // distinct + min + join formulation would shuffle the frame 3×
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .groupBy("user_id").agg(collect_set(col("day")).as("days"))
      .select(col("user_id"), array_min(col("days")).as("first_day"),
        explode(col("days")).as("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"))
      .withColumn("returning_users", col("active_users") - col("new_users"))
    val wDay = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(wDay))
      .select("day", "active_users", "new_users", "returning_users", "cum_users")
  }

  /** #275 Gini coefficient of per-user event value — the one-number
    * inequality readout over the whole corpus (the Lorenz-curve summary
    * of [[paretoShare]]): G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with x
    * ascending and i the EXACT global rank from
    * [[Distributed.exactRank]] (range repartition + broadcast offsets —
    * no single-reducer window at any user count). Every product is
    * DECIMAL(38,0); the ×10⁶ quotient is one integer DIV, so the result
    * is engine-exact. Negative values are absent (cents of |value| sums
    * per user can still be negative in adversarial data — callers filter;
    * the audit reports the raw aggregate regardless).
    */
  def lorenzGini(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("user_id").agg(sum(col("c")).as("cents"))
    Distributed.exactRank(perUser, Seq.empty, Seq("cents", "user_id"))
      .agg(max(col("n_total")).as("n_users"),
        expr("sum(CAST(cents AS DECIMAL(38,0)))").as("sx"),
        expr("sum(CAST(rnk AS DECIMAL(38,0)) * cents)").as("six"))
      .select(col("n_users"),
        col("sx").cast("long").as("total_cents"),
        expr("CASE WHEN n_users * sx = 0 THEN NULL ELSE " +
          "CAST((2 * six - (CAST(n_users AS DECIMAL(38,0)) + 1) * sx) * 1000000 " +
          "DIV (CAST(n_users AS DECIMAL(38,0)) * sx) AS BIGINT) END").as("gini_e6"))
  }

  /** #269 Bot-traffic regularity audit: humans emit events with heavy-
    * tailed inter-arrival gaps; schedulers and scrapers emit metronomes.
    * Per user: gap count, median gap, MAD of gaps, and two flags —
    * `is_regular` (MAD ≤ 5% of median over ≥ minGaps gaps: a metronome)
    * and `is_rapid` (median under a second) — the pre-training filter
    * that keeps synthetic click-storms out of a behavioral corpus.
    *
    * ONE corpus scan, ONE user exchange: the lag window and a single
    * aggregation share the user_id partitioning; both medians (gap and
    * absolute-deviation) come from the per-user SORTED gap array with
    * row-local array arithmetic — the two-aggregation formulation
    * (median, join back, MAD) replays the scan+window per branch. The
    * array state is exactly what an exact-percentile aggregate buffers
    * anyway (that user's gaps); at 100 TB a per-user cap upstream bounds
    * pathological users. Thresholds are cross-multiplied comparisons on
    * the 4dp-rounded medians (identical arithmetic both engines), never
    * a ratio.
    */
  def botRegularity(spark: SparkSession, dir: String, minGaps: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    // linear-interpolation median of a sorted array (quantile_cont semantics)
    def medOf(arr: String) =
      s"CASE WHEN size($arr) % 2 = 1 " +
        s"THEN CAST(element_at($arr, CAST(size($arr) DIV 2 + 1 AS INT)) AS DOUBLE) " +
        s"ELSE (CAST(element_at($arr, CAST(size($arr) DIV 2 AS INT)) AS DOUBLE) + " +
        s"CAST(element_at($arr, CAST(size($arr) DIV 2 + 1 AS INT)) AS DOUBLE)) / 2.0 END"
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sort_array(collect_list(col("gap_us"))).as("g"))
      .withColumn("med_us", expr(s"round(${medOf("g")}, 4)"))
      .withColumn("ad",
        expr("array_sort(transform(g, x -> abs(CAST(x AS DOUBLE) - med_us)))"))
      .withColumn("mad_us", expr(s"round(${medOf("ad")}, 4)"))
      .select(col("user_id"), col("n_gaps"), col("med_us"), col("mad_us"),
        (col("n_gaps") >= minGaps && col("mad_us") * 20.0 <= col("med_us"))
          .cast("long").as("is_regular"),
        (col("med_us") < 1000000.0).cast("long").as("is_rapid"))
  }

  /** #292 Peak concurrency per day — the classic sweep-line: every
    * interval (start = ts, end = ts + value seconds, the
    * [[intervalUnion]] convention) contributes a +1 point at its start
    * and a −1 at its end; the exact global running sum of deltas IS the
    * number of concurrently-open intervals at each boundary, and the
    * per-day max of that sum is the capacity-planning number ("how many
    * sessions were open at once"). Ordering ties break ends-before-
    * starts (delta ascending), so back-to-back touching intervals never
    * count as concurrent. The global cumsum is
    * [[Distributed.exactCumSum]] — a range exchange on (t, delta, id)
    * plus a broadcast of per-partition offsets, NEVER a single-reducer
    * global window, so 100 TB of events sweep at full cluster width.
    * Peak is sampled at event boundaries (where it mathematically
    * attains its max); a day whose every instant is inside intervals but
    * has no boundary reports no row, which is the honest reading.
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val iv = withTs(spark, dir).select(
      col("event_id"), col("ts_us").as("s_us"),
      (col("ts_us") + floor(col("value") * lit(1000000.0)).cast("long")).as("e_us"))
    val pts = iv.select(col("event_id"), col("s_us").as("t_us"), lit(1L).as("delta"))
      .unionByName(iv.select(col("event_id"), col("e_us").as("t_us"), lit(-1L).as("delta")))
    Distributed.exactCumSum(pts, Seq("t_us", "delta", "event_id"), "delta")
      .groupBy(expr("t_us DIV 86400000000").as("day_idx"))
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
        max(col("cum")).as("peak_concurrency"))
  }

  /** #293 Discrete-time churn hazard and survival — the retention curve
    * in its statistically-honest form: per user, lifetime_weeks =
    * (last_active_day − first_active_day) DIV 7; at_risk(k) = users with
    * lifetime ≥ k, churned(k) = users with lifetime exactly k, hazard =
    * churned/at_risk (the conditional churn probability actuarial tables
    * are built from), survival = P(lifetime > k). With no censoring the
    * Kaplan–Meier product-limit estimator collapses to these plain
    * ratios, so everything stays EXACT integer arithmetic (ppm via
    * integer DIV — no float product chains to drift cross-engine). One
    * user_id exchange for lifetimes; the at-risk reverse-cumsum runs on
    * the week-indexed frame, which is calendar-bounded (≤ weeks in the
    * observation window) — a safe tiny window at any corpus size.
    */
  def churnHazard(spark: SparkSession, dir: String): DataFrame = {
    val life = withTs(spark, dir)
      .groupBy("user_id")
      .agg(max(col("ts_us")).as("max_us"), min(col("ts_us")).as("min_us"))
      .select(col("user_id"), expr("(max_us - min_us) DIV 604800000000").as("week"))
    val perWeek = life.groupBy("week").agg(count(lit(1)).as("churned"))
    val total = perWeek.agg(sum(col("churned")).as("n_total"))
    val wAtRisk = Window.orderBy(col("week").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perWeek
      .withColumn("at_risk", sum(col("churned")).over(wAtRisk))
      .crossJoin(broadcast(total))
      .select(col("week"), col("at_risk"), col("churned"),
        expr("churned * 1000000 DIV at_risk").as("hazard_ppm"),
        expr("(at_risk - churned) * 1000000 DIV n_total").as("survival_ppm"))
  }

  /** #372 Right-censored survival — the honesty fix [[churnHazard]]
    * deliberately skips: a user whose LAST activity falls within the
    * trailing `horizonDays` of the observation window hasn't churned,
    * we just stopped watching (right-censoring; Kaplan & Meier JASA'58).
    * Censored users leave the risk set at their observed lifetime
    * WITHOUT counting as a churn event — treating them as churned (the
    * uncensored estimator's implicit move) biases every hazard upward,
    * worst in the newest cohorts.
    *
    * Cumulative hazard is Nelson–Aalen, H(t) = Σ_{t_i≤t} d_i/n_i, kept
    * as an EXACT integer cumsum of per-day ppm terms (each term one
    * positive integer DIV; integer addition is order-independent, so no
    * cross-engine float drift — the reason NA is reported rather than
    * the KM product, whose running ln/exp fold would drift). S(t) ≈
    * exp(−H(t)) for a reader who wants the curve.
    *
    * One user_id exchange for lifetimes; both windows run on the
    * day-indexed frame — calendar-bounded at any corpus size.
    */
  def survivalCensored(spark: SparkSession, dir: String,
      horizonDays: Int = 7): DataFrame = {
    val ev = withTs(spark, dir)
    val obsEnd = ev.agg(max(col("ts_us")).as("obs_us"))
    val life = ev.groupBy("user_id")
      .agg(max(col("ts_us")).as("max_us"), min(col("ts_us")).as("min_us"))
      .crossJoin(broadcast(obsEnd))
      .select(expr("(max_us - min_us) DIV 86400000000").as("day"),
        expr(s"CASE WHEN obs_us - max_us < CAST($horizonDays AS BIGINT) * 86400000000 " +
          "THEN 1L ELSE 0L END").as("censored"))
    val perDay = life.groupBy("day")
      .agg(count(lit(1)).as("n_ending"),
        sum(col("censored")).as("n_censored"),
        sum(lit(1L) - col("censored")).as("n_churned"))
    val wAtRisk = Window.orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("at_risk", sum(col("n_ending")).over(wAtRisk))
      .withColumn("hazard_ppm", expr("n_churned * 1000000 DIV at_risk"))
      .withColumn("cum_hazard_ppm", sum(col("hazard_ppm")).over(wCum))
      .select("day", "at_risk", "n_churned", "n_censored",
        "hazard_ppm", "cum_hazard_ppm")
  }

  /** #297 Markov removal-effect attribution — the data-driven alternative
    * to the positional heuristics in [[attributionCompare]]: model each
    * user journey (truncated at the first purchase) as a first-order
    * Markov chain over event types, compute the absorption probability
    * START → CONV, then for each channel re-solve WITHOUT it (transitions
    * into the removed channel fall to END) — the relative drop is the
    * channel's removal effect, and conversions are attributed
    * proportionally to the normalized effects. The corpus-scale work is
    * ONE window pass + one (src,dst) count aggregation; the chain itself
    * is (#event types)² ≈ tiny, so the absorption probabilities are a
    * bounded driver-side solve — the same "distributed counts,
    * driver-side argmax" shape as BPE training. The solve is matrix-power
    * DOUBLING (T^1024 via 10 squarings over states ∪ {CONV}, CONV
    * absorbing, END/removed transitions dropping mass) rather than
    * elimination: a fixed operation count with no data-dependent
    * pivoting, so the DuckDB oracle replays the identical arithmetic as
    * ten matmul CTEs over (scenario, i, j, v) rows and the entry is
    * hash-verified end to end. Transition probabilities are exact
    * integer ratios n/out on both sides; outputs round to integer
    * ppm/cents, far coarser than the ~1e-13 summation-order noise a
    * contraction admits. UtilSpec pins a hand-solvable two-channel chain.
    */
  def markovAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val journeys = withTs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("purch_before",
        coalesce(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("purch_before") === 0)
    val steps = journeys
      .withColumn("rn", row_number().over(w))
      .withColumn("next_t", lead(col("event_type"), 1).over(w))
    def absorb(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c === "purchase", "CONV").otherwise(c)
    val trans = steps.filter(col("rn") === 1)
      .select(lit("START").as("src"), absorb(col("event_type")).as("dst"))
      .unionByName(steps.filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("src"),
          coalesce(absorb(col("next_t")), lit("END")).as("dst")))
    val counts = trans.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val channels = counts.keys.map(_._1).filter(_ != "START").toSeq.sorted
    val nConv = counts.collect { case ((_, "CONV"), n) => n }.sum.toDouble
    // absorption probability START → CONV with `removed` channels absent
    // (transitions into them leak to END): T^1024 by repeated squaring
    // over states ∪ {CONV} (CONV absorbing; mass into END/removed simply
    // has no column). 2^10 steps bounds the residual by ρ^1024 for any
    // substochastic ρ < 1 — far below the ppm rounding grain — and the
    // fixed op count (no pivoting) replays in SQL.
    def pConv(removed: Set[String]): Double = {
      val ts = ("START" +: channels.filterNot(removed)) :+ "CONV"
      val idx = ts.zipWithIndex.toMap
      val n = ts.length
      var m = Array.ofDim[Double](n, n)
      for (i <- 0 until n if ts(i) != "CONV") {
        val out = counts.collect { case ((s, _), c) if s == ts(i) => c }.sum.toDouble
        if (out > 0) for (((s, d), c) <- counts if s == ts(i))
          idx.get(d).foreach(j => m(i)(j) += c / out)
      }
      m(n - 1)(n - 1) = 1.0
      for (_ <- 0 until 10) {
        val sq = Array.ofDim[Double](n, n)
        for (i <- 0 until n; k <- 0 until n if m(i)(k) != 0.0; j <- 0 until n)
          sq(i)(j) += m(i)(k) * m(k)(j)
        m = sq
      }
      m(0)(n - 1)
    }
    val pFull = pConv(Set.empty)
    val effects = channels.map { c =>
      val re = if (pFull <= 0) 0.0
        else math.max(0.0, 1.0 - pConv(Set(c)) / pFull)
      (c, re)
    }
    val reSum = effects.map(_._2).sum
    // floor(x + 0.5) on BOTH sides (here and the DuckDB oracle) — a single
    // deterministic rounding formula instead of engine-specific
    // HALF_UP/HALF_EVEN round(); conversions ship as integer cents
    effects.map { case (c, re) =>
      (c, math.floor(re * 1000000 + 0.5).toLong,
        if (reSum <= 0) 0L
        else math.floor(nConv * re / reSum * 100 + 0.5).toLong)
    }.toDF("channel", "removal_effect_ppm", "attributed_conv_c2")
  }

  /** #323 INCREMENTAL sessionization — the batch counterpart of the
    * streaming session state in [[graft.streaming.CdcStreams]]: a new
    * (append-only in event time) micro-batch folds into a STORED session
    * table using only per-user bounded state — the session count and the
    * open last session — never the historical events. The head delta
    * session merges into the stored open session when the gap allows;
    * remaining delta sessions renumber on top. Gap chaining is local, so
    * the folded table is IDENTICAL to re-sessionizing all events — the
    * oracle is literally the `ev_sessionize` full-recompute SQL, and the
    * spec plants both the merge and the new-session boundary cases.
    *
    * Scale: the delta path touches only delta events + one per-user state
    * row; every join shares the user_id hash partitioning. The batch
    * boundary is the midpoint of the event-time range so the oracle can
    * replay the identical split.
    */
  def sessionizeDelta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val ev = withTs(spark, dir).select("user_id", "event_id", "ts_us", "value")
    val pivot = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("pv"))
    val sp = ev.crossJoin(broadcast(pivot))
    val bs = sessionizeFrom(sp.filter(col("ts_us") <= col("pv")).drop("pv"))
      .localCheckpoint() // the stored session table (read by keep + state)
    val ds = sessionizeFrom(sp.filter(col("ts_us") > col("pv")).drop("pv"))
    val state = bs.groupBy("user_id").agg(
      max(col("session_id")).as("m"),
      max_by(struct(col("n_events"), col("session_value"), col("start_us"),
        col("end_us")), col("session_id")).as("lastS"))
    val d1 = ds.filter(col("session_id") === 1)
      .select(col("user_id"), col("n_events").as("d_n"),
        col("session_value").as("d_v"), col("start_us").as("d_start"),
        col("end_us").as("d_end"))
    val dec = d1.join(state, Seq("user_id"), "left")
      .select(col("user_id"), coalesce(col("m"), lit(0L)).as("m"),
        coalesce(col("m").isNotNull &&
          col("d_start") - col("lastS.end_us") <= GapUs, lit(false)).as("mrg"),
        col("lastS"), col("d_n"), col("d_v"), col("d_end"))
      .localCheckpoint() // read three ways: drop-last, merged rows, renumber
    val baseKeep = bs.join(
        dec.filter(col("mrg")).select(col("user_id"), col("m").as("__drop_id")),
        Seq("user_id"), "left")
      .filter(col("__drop_id").isNull || col("session_id") =!= col("__drop_id"))
      .drop("__drop_id")
    val mergedRows = dec.filter(col("mrg")).select(
      col("user_id"), col("m").as("session_id"),
      (col("lastS.n_events") + col("d_n")).as("n_events"),
      // decimal re-add: both inputs are exact 2-dp, the sum must equal the
      // full recompute's round(sum(decimal), 2) bit-for-bit
      (col("lastS.session_value").cast(DecimalType(12, 2)) +
        col("d_v").cast(DecimalType(12, 2))).cast("double").as("session_value"),
      col("lastS.start_us").as("start_us"), col("d_end").as("end_us"))
    val dsShifted = ds.join(dec.select(col("user_id"), col("m"), col("mrg")),
        Seq("user_id"), "left")
      .filter(!(coalesce(col("mrg"), lit(false)) && col("session_id") === 1))
      .select(col("user_id"),
        (col("session_id") + coalesce(col("m"), lit(0L)) -
          when(coalesce(col("mrg"), lit(false)), 1L).otherwise(0L)).as("session_id"),
        col("n_events"), col("session_value"), col("start_us"), col("end_us"))
    baseKeep.unionByName(mergedRows).unionByName(dsShifted)
  }

  /** #325 Difference-in-differences — the experiment readout run when a
    * rollout is staggered instead of randomized: treated cohort (here the
    * deterministic user-id parity, standing in for an assignment column)
    * vs control, before vs after the cutover (event-time midpoint, so the
    * oracle replays the same split). did_e4 = (post_T − pre_T) −
    * (post_C − pre_C) over exact ×10⁴-cents cell means with sign-safe
    * integer DIV (floor == truncate only for non-negative numerators, so
    * the sign is split out first — the ts_trend convention).
    *
    * Scale: ONE fact scan + one single-row conditional aggregation; the
    * pivot is a broadcast scalar. Nothing is per-cohort replayed.
    */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val e = Tables.events(spark, dir).select(col("user_id"),
      expr("ts DIV 1000").as("ts_us"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val pivot = e.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("pv"))
    def cell(name: String, cond: String): Seq[Column] = Seq(
      expr(s"count(CASE WHEN $cond THEN 1 END)").as(s"n_$name"),
      expr(s"coalesce(sum(CASE WHEN $cond THEN cents END), 0)").as(s"s_$name"))
    val cells = Seq(
      "pre_t" -> "user_id % 2 = 0 AND ts_us <= pv",
      "post_t" -> "user_id % 2 = 0 AND ts_us > pv",
      "pre_c" -> "user_id % 2 = 1 AND ts_us <= pv",
      "post_c" -> "user_id % 2 = 1 AND ts_us > pv")
    val aggs = cells.flatMap { case (n, c) => cell(n, c) }
    def meanE4(n: String): String =
      s"CASE WHEN n_$n = 0 THEN NULL WHEN s_$n < 0 " +
        s"THEN -((-s_$n) * 10000 DIV n_$n) ELSE s_$n * 10000 DIV n_$n END"
    e.crossJoin(broadcast(pivot))
      .agg(aggs.head, aggs.tail: _*)
      .select((cells.map { case (n, _) => col(s"n_$n") } ++
        cells.map { case (n, _) =>
          expr(meanE4(n)).cast("long").as(s"mean_${n}_e4") }): _*)
      .withColumn("did_e4", expr(
        "(mean_post_t_e4 - mean_pre_t_e4) - (mean_post_c_e4 - mean_pre_c_e4)"))
  }

  /** DuckDB oracle for [[diffInDiff]]: same cells, same sign-safe DIV. */
  def diffInDiffOracle: String = {
    val cells = Seq(
      "pre_t" -> "user_id % 2 = 0 AND ts_us <= pv",
      "post_t" -> "user_id % 2 = 0 AND ts_us > pv",
      "pre_c" -> "user_id % 2 = 1 AND ts_us <= pv",
      "post_c" -> "user_id % 2 = 1 AND ts_us > pv")
    val aggs = cells.map { case (n, c) =>
      s"count(CASE WHEN $c THEN 1 END) AS n_$n, " +
        s"coalesce(sum(CASE WHEN $c THEN cents END), 0) AS s_$n"
    }.mkString(", ")
    val means = cells.map { case (n, _) =>
      s"CAST(CASE WHEN n_$n = 0 THEN NULL WHEN s_$n < 0 " +
        s"THEN -((-s_$n) * 10000 // n_$n) ELSE s_$n * 10000 // n_$n END AS BIGINT)" +
        s" AS mean_${n}_e4"
    }.mkString(", ")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
       |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       |p AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS pv FROM e),
       |a AS (SELECT $aggs FROM e, p),
       |m AS (SELECT n_pre_t, n_post_t, n_pre_c, n_post_c, $means FROM a)
       |SELECT *, (mean_post_t_e4 - mean_pre_t_e4) -
       |  (mean_post_c_e4 - mean_pre_c_e4) AS did_e4 FROM m""".stripMargin
  }

  /** #326 Conversion rate by attribution window — the product question
    * "how long do we wait before calling a signup lost": for each window
    * (1 h / 1 d / 7 d), how many first-signups converted (first purchase
    * at-or-after signup, [[timeToConvert]] semantics) within it. Two
    * per-user aggregations + one 3-row broadcast fan-out — rates come out
    * exact as ppm.
    */
  def conversionWindows(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val ev = withTs(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_us")).as("signup_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts_us")).as("purchase_us"))
    val u = s.join(p, Seq("user_id"), "left").localCheckpoint()
    val wins = Seq(("1h", 3600000000L), ("1d", 86400000000L),
      ("7d", 7L * 86400000000L))
    import ev.sparkSession.implicits._
    val wdf = wins.toDF("window_label", "window_us")
    u.crossJoin(broadcast(wdf))
      .groupBy("window_label", "window_us")
      .agg(count(lit(1)).as("n_signed_up"),
        sum(when(col("purchase_us") >= col("signup_us") &&
          col("purchase_us") - col("signup_us") <= col("window_us"), 1L)
          .otherwise(0L)).as("n_converted"))
      .select(col("window_label"), col("window_us"), col("n_signed_up"),
        col("n_converted"),
        expr("n_converted * 1000000 DIV n_signed_up").as("rate_ppm"))
  }

  /** DuckDB oracle for [[conversionWindows]]. */
  def conversionWindowsOracle: String =
    """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS signup_us FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |pp AS (SELECT user_id, min(epoch_us(ts)) AS purchase_us FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |u AS (SELECT s.user_id, signup_us, purchase_us
      |  FROM s LEFT JOIN pp ON s.user_id = pp.user_id),
      |w AS (SELECT * FROM (VALUES ('1h', 3600000000), ('1d', 86400000000),
      |  ('7d', 604800000000)) AS t(window_label, window_us))
      |SELECT window_label, CAST(window_us AS BIGINT) AS window_us,
      |  count(*) AS n_signed_up,
      |  CAST(sum(CASE WHEN purchase_us >= signup_us
      |    AND purchase_us - signup_us <= window_us THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_converted,
      |  CAST(sum(CASE WHEN purchase_us >= signup_us
      |    AND purchase_us - signup_us <= window_us THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS rate_ppm
      |FROM u CROSS JOIN w GROUP BY 1, 2""".stripMargin

  /** #333 Sample-ratio mismatch (SRM) check — the guardrail every A/B
    * readout ([[diffInDiff]], ev_ab_test, ev_ab_cuped) silently assumes:
    * is the 50/50 assignment ACTUALLY 50/50 at the user grain? A skewed
    * split means the bucketing (or logging) is broken and every
    * downstream effect estimate is garbage. One-degree chi-square against
    * the even split, exact: χ² = (n_a − n_b)²/n as a ×10⁴ integer;
    * flag at the 3.8415 critical value (p < 0.05).
    */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("chi2_e4", expr(
        "CASE WHEN n_users = 0 THEN NULL " +
          "ELSE (n_a - n_b) * (n_a - n_b) * 10000 DIV n_users END"))
      .withColumn("srm_flag",
        (col("chi2_e4") > 38415L).cast("long"))

  /** DuckDB oracle for [[srmCheck]]. */
  def srmCheckOracle: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |a AS (SELECT count(*) AS n_users,
      |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
      |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b FROM u)
      |SELECT n_users, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(CASE WHEN n_users = 0 THEN NULL
      |    ELSE (n_a - n_b) * (n_a - n_b) * 10000 // n_users END AS BIGINT) AS chi2_e4,
      |  CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 10000 // n_users > 38415
      |    THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
      |FROM a""".stripMargin

  /** #330 Error-budget burn rate (SRE multiwindow alerting): against a
    * 99% SLO (1% budget), each day's burn = error_ratio / budget as an
    * exact ×100 integer, both for the day itself (fast window) and the
    * trailing 7 days (slow window, via the calendar fan-out —
    * [[slidingDistinct]]'s trick on counts). `page` fires only when BOTH
    * windows burn hot (day ≥ 14.4×, week ≥ 6×) — the standard
    * fast+slow guard against paging on a blip or ignoring a slow leak.
    * One corpus aggregate; everything after is calendar-sized.
    */
  def burnRate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val daily = Tables.events(spark, dir)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"),
        col("event_type"))
      .groupBy("day")
      .agg(count(lit(1)).as("tot"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      .localCheckpoint() // feeds the day branch and the 7d fan-out
    val offs = spark.range(0, 7).select(col("id").as("off"))
    val w7 = daily.join(broadcast(offs))
      .select((col("day") + col("off")).as("day"), col("tot"), col("err"))
      .groupBy("day")
      .agg(sum(col("tot")).as("tot7"), sum(col("err")).as("err7"))
    daily.join(w7, Seq("day"))
      .select(col("day"), col("tot").as("n_events"), col("err").as("n_errors"),
        expr("err * 10000 DIV tot").as("burn_day_e2"),
        col("tot7").as("n_events_7d"), col("err7").as("n_errors_7d"),
        expr("err7 * 10000 DIV tot7").as("burn_7d_e2"))
      .withColumn("page",
        (col("burn_day_e2") >= 1440 && col("burn_7d_e2") >= 600).cast("long"))
  }

  /** DuckDB oracle for [[burnRate]]. */
  def burnRateOracle: String =
    """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS tot,
      |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
      |  FROM events GROUP BY 1),
      |w7 AS (SELECT d.day + o.off AS day, sum(d.tot) AS tot7, sum(d.err) AS err7
      |  FROM daily d CROSS JOIN (SELECT CAST(unnest(range(0, 7)) AS BIGINT) AS off) o
      |  GROUP BY 1)
      |SELECT day, tot AS n_events, CAST(err AS BIGINT) AS n_errors,
      |  CAST(err * 10000 // tot AS BIGINT) AS burn_day_e2,
      |  CAST(tot7 AS BIGINT) AS n_events_7d, CAST(err7 AS BIGINT) AS n_errors_7d,
      |  CAST(err7 * 10000 // tot7 AS BIGINT) AS burn_7d_e2,
      |  CAST(CASE WHEN err * 10000 // tot >= 1440
      |    AND err7 * 10000 // tot7 >= 600 THEN 1 ELSE 0 END AS BIGINT) AS page
      |FROM daily JOIN w7 USING (day)""".stripMargin

  /** #324 DAU / trailing-7-day WAU / stickiness — the sliding-window
    * DISTINCT that a naive `count(distinct) OVER (RANGE 7 days)` cannot
    * express and a per-day loop cannot scale: the deduped user-day frame
    * fans out to the ≤7 target days it supports (map-side, broadcast
    * offsets), one distinct + one count per target day. Exact, two
    * shuffles, work ∝ 7×user-days regardless of event volume.
    */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .distinct()
      .localCheckpoint() // feeds both the DAU and the fan-out branch
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val offsets = spark.range(0, 7).select(col("id").as("off"))
    val wau = ud.join(broadcast(offsets))
      .select(col("user_id"), (col("day") + col("off")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau_trailing7"))
    // inner join: days with zero events have no DAU row on either engine
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau_trailing7"),
        expr("dau * 10000 DIV wau_trailing7").as("stickiness_e4"))
  }

  /** #344 Off-policy evaluation by inverse-propensity replay (IPS):
    * "what would the ε-greedy-on-modal policy have earned on this logged
    * traffic" — the counterfactual readout an experimentation pipeline
    * wants BEFORE an online test. The logged behavior policy's propensity
    * is its empirical action rate per segment (p = n_sa/n_s); the target
    * policy plays the modal action with ε=0.2 spread over the others
    * (all mass on modal when it's the only action). Because the weights
    * depend only on (segment, action), the whole estimator folds onto the
    * segment×action aggregate — per-event weights never materialize, so
    * cost is two small shuffles at ANY event volume. Every output is
    * exact integer fixed-point: per-action terms use one integer DIV each
    * (non-negative numerators — values are positive cents) and sum, so
    * Spark and the SQL replay agree bit-for-bit; ess_e4 is the effective
    * sample size (Kish) — the estimator-health gauge that says how many
    * logged events the reweighting actually kept.
    */
  def policyReplay(spark: SparkSession, dir: String): DataFrame = {
    val sa = Tables.events(spark, dir)
      .select((col("user_id") % 8).as("segment"), col("event_type").as("action"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .groupBy("segment", "action")
      .agg(count(lit(1)).as("n_a"),
        (sum(col("v")) * 100).cast("long").as("cents_a"))
    val w = Window.partitionBy("segment")
    val wo = w.orderBy(col("n_a").desc, col("action").asc)
    sa.select(col("segment"), col("action"), col("n_a"), col("cents_a"),
        row_number().over(wo).as("rk"),
        count(lit(1)).over(w).as("k"),
        sum(col("n_a")).over(w).as("n_logs"),
        sum(col("cents_a")).over(w).as("total_cents"))
      // ε-greedy target as exact rationals: modal gets 4/5 (1/1 when the
      // segment logged a single action), each alternative 1/(5(k-1))
      .selectExpr("segment", "action", "n_a", "cents_a", "rk", "k",
        "n_logs", "total_cents",
        "CASE WHEN rk = 1 AND k = 1 THEN 1 WHEN rk = 1 THEN 4 ELSE 1 END AS pi_num",
        "CASE WHEN rk = 1 AND k = 1 THEN 1 WHEN rk = 1 THEN 5 ELSE 5 * (k - 1) END AS pi_den")
      .groupBy("segment")
      .agg(max(col("k")).as("k_actions"),
        max(col("n_logs")).as("n_logs"),
        max(when(col("rk") === 1, col("action"))).as("modal_action"),
        sum(when(col("rk") === 1, col("n_a"))).as("n_modal"),
        max(expr("total_cents * 10000 DIV n_logs")).as("logged_cents_e4"),
        sum(expr("pi_num * cents_a * 10000 DIV (pi_den * n_a)"))
          .cast("long").as("ips_cents_e4"),
        sum(expr("pi_num * pi_num * 100000000 DIV (pi_den * pi_den * n_a)"))
          .cast("long").as("s_e8"))
      .selectExpr("segment", "k_actions", "modal_action", "n_logs", "n_modal",
        "logged_cents_e4", "ips_cents_e4",
        "CAST(ips_cents_e4 - logged_cents_e4 AS BIGINT) AS lift_e4",
        "CAST(1000000000000 DIV s_e8 AS BIGINT) AS ess_e4")
  }

  /** #376 `ev_decile_lift` — gains/lift table: rank users by an
    * engagement score (click+view volume), cut into deciles, and report
    * how the positives (purchasers) concentrate — cumulative capture and
    * lift-vs-base-rate per decile, the standard readout for "is this
    * score worth targeting on". Deterministic decile assignment:
    * ntile(10) over (score DESC, user_id) — a total order, so both
    * engines cut identically; all rates exact ×10⁴ integers.
    *
    * Scale: one user-sized aggregate, then ntile over the USER frame —
    * at 100 TB the user frame is the small output of the first
    * aggregate, and a single-reducer rank over users is the
    * by-construction-bounded case (same argument as the RFM segmenter);
    * the decile frame itself is 10 rows.
    */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type").isin("click", "view"), 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("pos"))
    // exact distributed NTILE (range-sort + broadcast offsets) — never a
    // single-reducer global ntile window; (−score, user_id) is the same
    // total order as (score DESC, user_id ASC), so the bucket cut is
    // identical to SQL ntile and the DuckDB oracle replays it verbatim
    val deciled = Distributed.exactNtile(
        perUser.withColumn("neg_score", -col("score")),
        Seq.empty, Seq("neg_score", "user_id"), 10, "decile")
      .withColumn("decile", col("decile").cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
    val w = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciled
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("total_pos", sum(col("n_pos")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("total_users", sum(col("n_users")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .selectExpr("decile", "n_users", "n_pos",
        "n_pos * 10000 DIV n_users AS pos_rate_e4",
        "cum_pos * 10000 DIV total_pos AS capture_e4",
        "n_pos * total_users * 10000 DIV (n_users * total_pos) AS lift_e4")
  }

  /** #377 `ev_att_stratified` — stratified average-treatment-effect on
    * the treated: treatment = the user signed up, outcome = purchase
    * spend (exact cents), confounder = engagement volume. Users are
    * stratified into activity buckets (floor(log2(n_events)) — the
    * bit-length trick, integer-exact both engines); within each stratum
    * treated and control means are compared, and the per-stratum effects
    * combine weighted by TREATED counts (the ATT estimand). Strata with
    * no control users report null effect and are excluded from the
    * pooled row (`stratum = -1` carries the pooled ATT) — the standard
    * common-support rule made explicit in the output.
    *
    * All arithmetic is exact: cents are integers, means stay as
    * (sum, n) pairs until the final ×10⁴ division, so the oracle
    * replays bit-for-bit. One user-sized aggregate + one stratum-sized
    * aggregate; nothing data-sized past the first groupBy.
    */
  def attStratified(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("treated"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("cents"))
      // floor(log2(n_events)) via bit length: length(bin(x)) - 1
      .withColumn("stratum",
        expr("CAST(length(bin(n_events)) - 1 AS BIGINT)"))
    val strata = perUser.groupBy("stratum")
      .agg(sum(when(col("treated") === 1L, 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("treated") === 0L, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("treated") === 1L, col("cents")).otherwise(0L)).as("t_cents"),
        sum(when(col("treated") === 0L, col("cents")).otherwise(0L)).as("c_cents"))
      .selectExpr("stratum", "n_treated", "n_control",
        "CASE WHEN n_treated > 0 THEN t_cents * 10000 DIV n_treated END AS t_mean_e4",
        "CASE WHEN n_control > 0 THEN c_cents * 10000 DIV n_control END AS c_mean_e4")
      .withColumn("effect_e4",
        expr("CASE WHEN n_treated > 0 AND n_control > 0 " +
          "THEN t_mean_e4 - c_mean_e4 END"))
    val pooled = strata
      .filter(col("n_treated") > 0 && col("n_control") > 0)
      .agg(sum(col("n_treated")).as("n_treated"),
        sum(col("n_control")).as("n_control"),
        sum(expr("effect_e4 * n_treated")).as("wsum"))
      // sign-split: Spark DIV truncates toward zero, DuckDB // floors —
      // a negative pooled effect (treated spend < control) would diverge
      // by one ULP without this (same guard as qRevenueMomentum)
      .selectExpr("CAST(-1 AS BIGINT) AS stratum", "n_treated", "n_control",
        "CAST(NULL AS BIGINT) AS t_mean_e4", "CAST(NULL AS BIGINT) AS c_mean_e4",
        "CASE WHEN wsum < 0 THEN -((-wsum) DIV n_treated) " +
          "ELSE wsum DIV n_treated END AS effect_e4")
    strata.unionByName(pooled)
  }

  /** #405 `ev_dwell_time` — dwell (time-on-step) distribution per event
    * type: each event's gap to the SAME user's next event, capped at the
    * session gap (30 min — past that the user left, the tail is absence
    * not engagement), summarized as exact-rank P50/P90 (ceil-rank
    * convention, [[Distributed.exactRank]] — no single-reducer
    * percentile sort) plus the capped-tail share. The product metric
    * behind "which step loses people": one lead() over the user
    * partitioning the sessionizer already uses, then a type-sized
    * aggregate.
    */
  def dwellTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val dwells = withTs(spark, dir)
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .select(col("event_type"), col("event_id"),
        least(col("next_us") - col("ts_us"), lit(GapUs)).as("dwell_us"),
        (col("next_us") - col("ts_us") >= GapUs).cast("long").as("capped"))
    val ranked = Distributed.exactRank(dwells, Seq("event_type"),
      Seq("dwell_us", "event_id"))
    ranked.groupBy("event_type")
      .agg(max(col("n_total")).as("n_dwells"),
        min(when(col("rnk") === expr("(50 * n_total + 99) DIV 100"),
          col("dwell_us"))).as("p50_dwell_us"),
        min(when(col("rnk") === expr("(90 * n_total + 99) DIV 100"),
          col("dwell_us"))).as("p90_dwell_us"),
        sum(col("capped")).as("n_capped"))
      .withColumn("capped_ppm", expr("n_capped * 1000000 DIV n_dwells"))
  }

  /** #385 `ev_segment_migration` — period-over-period segment flow (the
    * customer-migration matrix every retention review reads): the event
    * timeline splits at its midpoint (exact integer µs, reproducible — no
    * wall clock), each user gets a spend quartile per half (ntile over
    * (cents desc, user_id) — total order, engines cut identically; users
    * silent in a half land in segment 0 = inactive), and the output is
    * the (from, to) transition census with exact ppm of the user base.
    * Scale: two user-sized aggregates + one user-sized self-join; the
    * quartile rank runs on the user frame, not the event frame.
    */
  def segmentMigration(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTs(spark, dir).select(col("user_id"), col("ts_us"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2"))
      .head().getLong(0)
    // quartiles via the distributed exact NTILE (same cut as SQL ntile —
    // the oracle replays it), not a single-reducer global window
    def half(cond: org.apache.spark.sql.Column, name: String): DataFrame =
      Distributed.exactNtile(
          ev.filter(cond).groupBy("user_id")
            .agg(sum(col("cents")).as("spend"))
            .withColumn("neg_spend", -col("spend")),
          Seq.empty, Seq("neg_spend", "user_id"), 4, name)
        .withColumn(name, col(name).cast("long"))
        .select("user_id", name)
    val h1 = half(col("ts_us") <= mid, "seg_from")
    val h2 = half(col("ts_us") > mid, "seg_to")
    val users = ev.select("user_id").distinct()
    val joined = users
      .join(h1, Seq("user_id"), "left").na.fill(0L, Seq("seg_from"))
      .join(h2, Seq("user_id"), "left").na.fill(0L, Seq("seg_to"))
    joined.groupBy("seg_from", "seg_to")
      .agg(count(lit(1)).as("n_users"))
      .withColumn("total_users",
        sum(col("n_users")).over(Window.partitionBy()))
      .selectExpr("seg_from", "seg_to", "n_users",
        "n_users * 1000000 DIV total_users AS share_ppm")
  }

  /** #386 `ev_velocity_rules` — sliding-window velocity flags (the
    * fraud/abuse rule pack every CDC consumer feeds): per event, the SAME
    * user's event count and exact cents in the trailing 10 minutes
    * (range frame [t−10min, t], value-based so ties are engine-identical),
    * emitting only events that trip a rule — count ≥ 5 or cents ≥ 50_00 —
    * with which rule fired. One user_id shuffle; the range frame runs on
    * the same sort the sessionizer uses.
    */
  def velocityRules(spark: SparkSession, dir: String,
      maxN: Long = 5, maxCents: Long = 5000): DataFrame = {
    val winUs = 10L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-winUs, 0)
    withTs(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("n_10m", count(lit(1)).over(w))
      .withColumn("cents_10m", sum(col("cents")).over(w))
      .filter(col("n_10m") >= maxN || col("cents_10m") >= maxCents)
      .selectExpr("event_id", "user_id", "ts_us", "n_10m", "cents_10m",
        s"CASE WHEN n_10m >= $maxN AND cents_10m >= $maxCents THEN 'both' " +
          s"WHEN n_10m >= $maxN THEN 'count' ELSE 'amount' END AS rule_fired")
  }

  /** #382 `ml_pit_training_set` — point-in-time training-set assembly,
    * the feature-store query every supervised pipeline on event data
    * needs and every leaky pipeline gets wrong: one row per label event
    * (purchase, label = exact cents) carrying ONLY features computable
    * STRICTLY BEFORE the label timestamp — last prior event's value and
    * type (lag over the key-ordered log), trailing-7-day activity count
    * (range frame ending at −1 µs, so same-instant events never leak),
    * prior purchase count, and days since the user's first event. The
    * whole assembly is window functions over ONE user_id shuffle — the
    * same partitioning the sessionizer uses; nothing joins, nothing is
    * data-sized twice. Rows with no history keep null features (the
    * cold-start reality), never silently drop.
    */
  def pitTrainingSet(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = withTs(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val byKey = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val trailing7d = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-7L * dayUs, -1L)
    ev
      .withColumn("f_last_value_c", lag(col("cents"), 1).over(byKey))
      .withColumn("f_last_type", lag(col("event_type"), 1).over(byKey))
      .withColumn("f_events_7d", count(lit(1)).over(trailing7d))
      .withColumn("f_prior_purchases",
        coalesce(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(byKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("f_days_active",
        expr(s"(ts_us - min(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) DIV $dayUs"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("cents").as("label_cents"), col("f_last_value_c"),
        col("f_last_type"), col("f_events_7d"), col("f_prior_purchases"),
        col("f_days_active"))
  }
}
