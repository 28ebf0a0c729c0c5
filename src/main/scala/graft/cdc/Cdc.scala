package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** CDC envelope + apply-changes operators, re-expressed Spark-first.
  *
  * The reference maintains a unified CDC event envelope (reference:
  * src/aurora_cdc/datasource/aurora_cdc_datasource_v2.py:55-90) and applies
  * it to target tables as SCD1 / SCD2 with DLT `apply_changes` (reference:
  * debezium-approach/notebooks/dlt_cdc_pipeline.py:264-329). Here the
  * `events` table plays the role of the change stream: key = user_id,
  * sequence = (ts, event_id), operation derived from event_type the same
  * way Debezium op-codes are mapped to readable operations (reference:
  * dlt_cdc_pipeline.py:190-197).
  *
  * Everything is a declarative DataFrame plan: single shuffle on the entity
  * key for the window-based apply-changes (no self-joins, no collect), so
  * each operator scales to arbitrarily many keys/rows.
  */
object Cdc {

  /** #1 Normalized CDC log: op mapping + microsecond sequence number.
    * `ts` is raw nanos (see Tables.eventsSchema); `ts DIV 1000` == DuckDB
    * epoch_us truncation.
    */
  def log(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type") === "error", "DELETE")
        .otherwise("UPDATE").as("operation"),
      expr("ts DIV 1000").as("seq_us"),
      col("event_type"), col("value"), col("props"))

  /** #2 Envelope payload parsing (reference parses the Debezium JSON value,
    * dlt_cdc_pipeline.py:166-187): real JSON-path extraction on both
    * engines (get_json_object ↔ DuckDB json_extract). The full nested
    * Debezium parse is [[Debezium.parseEnvelope]]; this is the scalar
    * payload-field fast path.
    */
  def parseProps(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir).select(
      col("event_id"), col("user_id"), col("operation"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** #262 Semi-structured key-space profile of the JSON props envelope:
    * discovers the key population (no schema assumed — `json_object_keys`
    * per row), and per key reports presence, fill rate, distinct values,
    * and the numeric range where values parse as numbers. This is the
    * schema-inference pre-flight for a payload column before promoting
    * keys to typed silver columns ([[parseProps]] is the promotion;
    * reference: the Debezium payload fields, dlt_cdc_pipeline.py:166-187).
    * One map-side explode + one aggregation on the (small) key space.
    */
  def propsProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val tot = ev.agg(count(lit(1)).as("n_total"))
    ev.select(explode(expr("json_object_keys(props)")).as("key"), col("props"))
      .withColumn("v", expr("get_json_object(props, concat('$.', key))"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_present"),
        countDistinct(col("v")).as("n_distinct"),
        sum(expr("CASE WHEN try_cast(v AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END"))
          .as("n_numeric"),
        min(expr("try_cast(v AS BIGINT)")).as("min_int"),
        max(expr("try_cast(v AS BIGINT)")).as("max_int"))
      .crossJoin(broadcast(tot))
      .withColumn("fill_ppm", expr("n_present * 1000000 DIV n_total"))
      .drop("n_total")
  }

  /** #3 SCD Type 1 current state: latest event per key wins; DELETE drops
    * the key (reference: dlt_cdc_pipeline.py:264-303, stored_as_scd_type=1).
    */
  def currentScd1(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("seq_us").desc, col("event_id").desc)
    log(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= "DELETE")
      .select(col("user_id"), col("operation").as("last_op"),
        col("event_id").as("last_event_id"), round(col("value"), 2).as("last_value"))
  }

  /** #4 SCD Type 2 history: valid_from/valid_to intervals per key
    * (reference: dlt_cdc_pipeline.py:312-329, stored_as_scd_type=2).
    * Open intervals use Long.MaxValue; is_current flags the live row.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("seq_us"), col("event_id"))
    log(spark, dir)
      .withColumn("valid_to_raw", lead(col("seq_us"), 1).over(w))
      .select(
        col("user_id"), col("event_id"), col("operation"),
        round(col("value"), 2).as("value"),
        col("seq_us").as("valid_from_us"),
        coalesce(col("valid_to_raw"), lit(Long.MaxValue)).as("valid_to_us"),
        col("valid_to_raw").isNull.as("is_current"))
  }

  /** #5 Change summary by entity + operation (reference:
    * dlt_cdc_pipeline.py:440-458, v_table_change_summary).
    */
  def changeSummary(spark: SparkSession, dir: String): DataFrame =
    log(spark, dir)
      .groupBy("event_type", "operation")
      .agg(count(lit(1)).as("total_changes"),
        min(col("seq_us")).as("first_change_us"),
        max(col("seq_us")).as("last_change_us"))

  /** #6 Quality metrics over 5-minute event-time windows (reference:
    * dlt_cdc_pipeline.py:338-372). `value` plays the role of the reference's
    * processing-delay metric; low_volume flag identical in spirit.
    */
  def qualityMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("tsx", timestamp_micros(expr("ts DIV 1000")))
      // window_start emitted as epoch µs (BIGINT): timestamp columns never
      // cross the engine boundary, dodging tz-awareness mismatches.
      .groupBy(unix_micros(window(col("tsx"), "5 minutes").getField("start"))
          .as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        countDistinct(col("user_id")).as("n_users"),
        // exact decimal sum / count: deterministic mean across engines
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double") / count(lit(1)), 4).as("avg_value"),
        round(max(col("value")), 2).as("max_value"))
      .withColumn("low_volume_flag", col("event_count") < 10)

  /** #7 Throughput: events/min + events/sec over 1-minute windows
    * (reference: dlt_cdc_pipeline.py:413-438, v_cdc_throughput).
    */
  def throughput(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("tsx", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(unix_micros(window(col("tsx"), "1 minute").getField("start"))
        .as("minute_start_us"))
      .agg(count(lit(1)).as("events_per_minute"))
      .withColumn("events_per_second", round(col("events_per_minute") / 60.0, 4))

  /** #8 Error dead-letter queue (reference: dlt_cdc_pipeline.py:381-404 +
    * error_flag rows in the datasource, aurora_cdc_datasource_v2.py:468-477).
    */
  def errorDlq(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error" || col("props").isNull || length(col("props")) === 0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        lit("SOURCE_OR_PARSE_ERROR").as("error_type"),
        round(col("value"), 2).as("value"))

  /** #9 Per-entity stream statistics (reference:
    * src/notebooks/demo/cdc_500_tables_streaming.py:394-408).
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("total_events"),
        countDistinct(col("user_id")).as("unique_users"),
        min(expr("ts DIV 1000")).as("first_event_us"),
        max(expr("ts DIV 1000")).as("last_event_us"))

  /** #10 Ingestion enrichment: date parts for partitioning (reference:
    * cdc_500_tables_streaming.py:127-134 adds year/month/day/hour columns).
    * is_weekend shown via dow — Spark dayofweek is 1=Sunday.
    */
  def enrich(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("tsx", timestamp_micros(expr("ts DIV 1000")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        year(col("tsx")).cast("long").as("y"), month(col("tsx")).cast("long").as("m"),
        dayofmonth(col("tsx")).cast("long").as("d"), hour(col("tsx")).cast("long").as("h"),
        dayofweek(col("tsx")).isin(1, 7).as("is_weekend"))

  /** #87 Offset-continuity check: event_ids whose successor is missing —
    * lost deliveries in a dense sequence (the binlog-position continuity
    * guarantee the reference gets from offset checkpointing). Expressed as
    * an anti join (scales; a global-ORDER window would single-partition),
    * plus a one-row summary with the expected-vs-actual count.
    */
  def gapCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id")
    val successors = ev.select((col("event_id") + 1).as("event_id"))
    val bounds = ev.agg(min("event_id").as("min_id"), max("event_id").as("max_id"),
      count(lit(1)).as("n_rows"))
    val missing = successors
      .join(ev, Seq("event_id"), "left_anti")
      .crossJoin(broadcast(bounds.select("max_id")))
      .filter(col("event_id") <= col("max_id"))
      .agg(count(lit(1)).as("n_gaps"))
    bounds.crossJoin(missing)
      .select(col("min_id"), col("max_id"), col("n_rows"),
        (col("max_id") - col("min_id") + 1).as("expected_rows"), col("n_gaps"),
        (col("n_gaps") === 0).as("is_contiguous"))
  }

  /** #86 Before/after images: each change event paired with the entity's
    * previous value (the envelope's `before`/`after` fields, reference:
    * aurora_cdc_datasource_v2.py:73-75 — derived here by a lag over the
    * key-ordered log instead of being captured at source).
    */
  def beforeAfter(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("seq_us"), col("event_id"))
    log(spark, dir)
      .withColumn("before_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("operation"), col("seq_us"),
        round(col("before_value"), 2).as("before_value"),
        round(col("value"), 2).as("after_value"),
        col("before_value").isNull.as("is_first_image"))
  }

  /** #96 Incremental aggregate maintenance — the PER-CHANGE-EVENT-TYPE net
    * effect of the change log on SUM(value)/COUNT, from before/after
    * images. INSERT contributes the after image, DELETE retracts the value
    * the state held (the before image), UPDATE applies (after − before).
    * One window pass + one aggregation: the streaming alternative to
    * recomputing a view, and the exact shape a foreachBatch MERGE applies
    * per micro-batch at 100 TB. DECIMAL deltas keep the sum
    * order-independent (cross-engine exact).
    *
    * Semantics: a true per-group materialized-view delta. Each change event
    * explodes into contribution rows — the retraction of the previous value
    * is attributed to the BEFORE event's type (the group that originally
    * held it), the new value to the current event's type. An UPDATE that
    * changes type therefore moves value AND a row between groups; one that
    * keeps type nets to (value - before, ±0 rows) in place. `n_changes`
    * counts each event exactly once (on its addition row; DELETE on its
    * retraction row). One window pass, map-side explode — still a single
    * shuffle on the entity key plus the final aggregation.
    */
  def netEffect(spark: SparkSession, dir: String): DataFrame =
    netEffectFrom(log(spark, dir))

  /** #258 Incremental-view-maintenance audit: folds the CDC log into
    * per-group (rows, value) aggregates purely from DELTAS under strict
    * upsert/tombstone semantics — an event retracts the previous LIVE
    * state of its key (whatever op wrote it; a key last seen as DELETE
    * retracts nothing) and asserts its own state unless it is itself a
    * DELETE — then recomputes the same aggregates directly from each
    * key's FINAL live row and proves the two agree. This is the
    * correctness contract of every streaming materialized view this
    * library maintains: the delta path telescopes per key to exactly the
    * final-state path, for any op sequence (update-born keys, repeated
    * upserts, delete-then-reinsert included — the cases naive
    * lag-retraction gets wrong).
    *
    * Scale shape: one window pass on the entity key feeds BOTH sides
    * (Catalyst reuses the sort), deltas union map-side, and each side is
    * one shrinking aggregation on the group key.
    */
  def ivmAudit(spark: SparkSession, dir: String): DataFrame =
    ivmAuditFrom(log(spark, dir))

  private[graft] def ivmAuditFrom(logDf: DataFrame): DataFrame = {
    val d = DecimalType(12, 2)
    val w = Window.partitionBy("user_id").orderBy(col("seq_us"), col("event_id"))
    val ann = logDf
      .withColumn("before_value", lag(col("value"), 1).over(w))
      .withColumn("before_type", lag(col("event_type"), 1).over(w))
      .withColumn("before_op", lag(col("operation"), 1).over(w))
      .withColumn("rn_desc",
        row_number().over(Window.partitionBy("user_id")
          .orderBy(col("seq_us").desc, col("event_id").desc)))
    val asserts = ann.filter(col("operation") =!= "DELETE")
      .select(col("event_type").as("grp"),
        round(col("value"), 2).cast(d).as("delta"), lit(1L).as("drows"))
    val retracts = ann
      .filter(col("before_op").isNotNull && col("before_op") =!= "DELETE")
      .select(col("before_type").as("grp"),
        (-round(col("before_value"), 2).cast(d)).as("delta"), lit(-1L).as("drows"))
    val ivm = asserts.unionByName(retracts)
      .groupBy(col("grp").as("event_type"))
      .agg(round(sum(col("delta")), 2).cast("double").as("value_ivm"),
        sum(col("drows")).as("rows_ivm"))
    val direct = ann.filter(col("rn_desc") === 1 && col("operation") =!= "DELETE")
      .groupBy("event_type")
      .agg(round(sum(round(col("value"), 2).cast(d)), 2).cast("double").as("value_direct"),
        count(lit(1)).as("rows_direct"))
    ivm.join(direct, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("rows_ivm"), lit(0L)).as("rows_ivm"),
        coalesce(col("rows_direct"), lit(0L)).as("rows_direct"),
        coalesce(col("value_ivm"), lit(0.0)).as("value_ivm"),
        coalesce(col("value_direct"), lit(0.0)).as("value_direct"))
      .withColumn("consistent",
        (col("rows_ivm") === col("rows_direct") &&
          col("value_ivm") === col("value_direct")).cast("long"))
  }

  /** Core over any normalized CDC log frame (so specs can plant
    * type-change sequences). */
  private[graft] def netEffectFrom(logDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("seq_us"), col("event_id"))
    // Cost note (r5, after measurement): this runs ~0.7 s at sf0.1 where
    // the r2 naive version ran ~0.25 s. The delta is the Generate — every
    // event explodes into 1-2 contribution rows so retractions can be
    // ATTRIBUTED to the before-event's type (r2 netted them in place,
    // which is wrong whenever an UPDATE changes type). Alternatives were
    // benched and are worse or no better here: a (assert_grp, retract_grp)
    // two-key aggregation + driver fold (~0.9 s — the second string key
    // and the extra job cost more than the explode), and a distributed
    // union of two aggregations (re-runs the window per branch; exchange
    // reuse does not cross the union). The explode stays: one window, one
    // Generate, one aggregation — at 100 TB the 2× row fan-out between
    // map-side-combined stages is noise next to the shuffle it feeds.
    // Money as integer cents via the SAME DECIMAL(12,2) cast the oracle
    // applies (exact), summed as longs; the final cents→double division
    // is the nearest-double the oracle's decimal-sum cast produces.
    logDf
      .withColumn("before_value", lag(col("value"), 1).over(w))
      .withColumn("before_type", lag(col("event_type"), 1).over(w))
      .selectExpr(
        """explode(CASE operation
          |  WHEN 'INSERT' THEN array(
          |    struct(event_type AS grp,
          |           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
          |           1L AS drows, 1L AS chg))
          |  WHEN 'DELETE' THEN array(
          |    struct(coalesce(before_type, event_type) AS grp,
          |           -coalesce(CAST(CAST(before_value AS DECIMAL(12,2)) * 100 AS BIGINT), 0L) AS cents,
          |           -1L AS drows, 1L AS chg))
          |  ELSE array(
          |    struct(coalesce(before_type, event_type) AS grp,
          |           -coalesce(CAST(CAST(before_value AS DECIMAL(12,2)) * 100 AS BIGINT), 0L) AS cents,
          |           -1L AS drows, 0L AS chg),
          |    struct(event_type AS grp,
          |           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
          |           1L AS drows, 1L AS chg))
          |END) AS c""".stripMargin)
      .groupBy(expr("c.grp").as("event_type"))
      .agg(expr("CAST(sum(c.cents) AS DOUBLE) / 100").as("net_value"),
        expr("CAST(sum(c.drows) AS BIGINT)").as("net_rows"),
        expr("CAST(sum(c.chg) AS BIGINT)").as("n_changes"))
  }

  /** #46 Time travel: the state of every entity as of a fixed point in time,
    * reconstructed from the SCD2 interval table (reference queries Delta
    * tables with timestampAsOf, notebooks/demo/unity_catalog_cdc_demo.py:
    * 573-592 — here the history itself answers point-in-time queries, no
    * table format needed). T = 2024-01-15T00:00:00Z.
    */
  val TimeTravelUs: Long = 1705276800000000L

  def timeTravel(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir)
      .filter(col("valid_from_us") <= TimeTravelUs &&
        col("valid_to_us") > TimeTravelUs &&
        col("operation") =!= "DELETE")
      .select("user_id", "event_id", "operation", "value")

  /** #47 As-of join: each purchase event matched to the user's latest prior
    * (or simultaneous) non-purchase event — the point-in-time dimension
    * lookup every CDC consumer needs. Spark-first via the union+window
    * trick: tag both sides, one sort per user, carry the last right-side
    * row forward — a single shuffle, no range self-join blowup. The right
    * side sorts before the left at equal timestamps to match ASOF's
    * inclusive (>=) semantics.
    */
  def asofJoin(spark: SparkSession, dir: String,
      tolerance: Option[Long] = None): DataFrame = {
    val lg = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
    val left = lg.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val right = lg.filter(col("event_type") =!= "purchase")
      .select(col("event_id").as("r_event_id"), col("user_id"),
        col("ts_us").as("r_ts_us"), col("value").as("r_value"))
    graft.operators.AsOf.asofJoin(left, right, keyCols = Seq("user_id"),
      leftTime = "ts_us", rightTime = "r_ts_us",
      carryCols = Seq("r_event_id", "r_ts_us", "r_value"),
      // side separates the frames, so each tiebreak column only has to
      // order its own side: event_id for left rows, r_event_id for right
      tiebreak = Seq("event_id", "r_event_id"), tolerance = tolerance)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_r_event_id").as("prior_event_id"),
        col("asof_r_ts_us").as("prior_ts_us"),
        round(col("asof_r_value"), 2).as("prior_value"),
        (col("ts_us") - col("asof_r_ts_us")).as("wait_us"))
  }

  /** Forward as-of: each non-purchase event matched to the user's NEXT
    * purchase at-or-after it — the time-to-conversion lookup, i.e.
    * [[asofJoin]] mirrored ([[graft.operators.AsOf]] `direction =
    * "forward"`). Same single sort-shuffle; ties keep the
    * smallest-event-id purchase.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val lg = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
    val left = lg.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts_us")
    val right = lg.filter(col("event_type") === "purchase")
      .select(col("event_id").as("r_event_id"), col("user_id"),
        col("ts_us").as("r_ts_us"), col("value").as("r_value"))
    graft.operators.AsOf.asofJoin(left, right, keyCols = Seq("user_id"),
      leftTime = "ts_us", rightTime = "r_ts_us",
      carryCols = Seq("r_event_id", "r_ts_us", "r_value"),
      tiebreak = Seq("event_id", "r_event_id"), direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_r_event_id").as("next_event_id"),
        col("asof_r_ts_us").as("next_ts_us"),
        round(col("asof_r_value"), 2).as("next_value"),
        (col("asof_r_ts_us") - col("ts_us")).as("lead_us"))
  }

  /** #11 Exactly-once dedup: duplicate deliveries (simulated re-delivery of
    * ~30% of the stream) collapsed to one row per event_id (reference
    * guarantees this via offset checkpointing,
    * aurora_cdc_datasource_v2.py:479-489; at 100 TB this is a hash
    * aggregation on the offset key — one shuffle, map-side partial).
    */
  def dedupExactlyOnce(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val redelivered = ev.unionAll(ev.filter(col("event_id") % 10 < 3))
    redelivered.groupBy("event_id")
      // min() not first(): duplicates are identical rows, but min keeps the
      // aggregation deterministic for the cross-engine hash compare.
      .agg(min(col("user_id")).as("user_id"),
        min(col("event_type")).as("event_type"),
        round(min(col("value")), 2).as("value"),
        count(lit(1)).as("deliveries"))
  }

  /** #12 Snapshot + change-log merge: initial load rows (reference does the
    * one-time JDBC snapshot, notebooks/demo/unity_catalog_cdc_demo.py:218-269)
    * overridden by CDC current state; CDC DELETE suppresses the snapshot row
    * — batch MERGE semantics (unity_catalog_cdc_demo.py:300-447).
    * customer plays the snapshot: c_custkey == user_id domain.
    */
  def snapshotMerge(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("seq_us").desc, col("event_id").desc)
    val cur = log(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("operation"), col("value"))
    val snap = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_acctbal").as("value"))
    // snapshot side is a table scan; change side is small relative to it at
    // scale — broadcast the current-state side on a real cluster.
    snap.join(cur.withColumnRenamed("user_id", "cu").withColumnRenamed("value", "cv"),
        col("user_id") === col("cu"), "full_outer")
      .filter(coalesce(col("operation"), lit("")) =!= "DELETE")
      .select(
        coalesce(col("user_id"), col("cu")).as("user_id"),
        when(col("cu").isNotNull, "CDC").otherwise("SNAPSHOT").as("src"),
        round(when(col("cu").isNotNull, col("cv")).otherwise(col("value")), 2).as("value"))
  }

  /** Per-entity-type freshness monitor — the "is my CDC current" dashboard
    * row (the reference's monitoring cell tracks last-event recency per
    * table): last event time per type, staleness against the newest event
    * anywhere (the anchor a batch audit can compute without a wall clock,
    * keeping the result reproducible), and a configurable stale flag. One
    * aggregate + a broadcast scalar.
    */
  def freshness(spark: SparkSession, dir: String,
      staleAfterUs: Long = 3600000000L): DataFrame = {
    val perType = log(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max(col("seq_us")).as("last_event_us"))
    val anchor = perType.agg(max(col("last_event_us")).as("corpus_max_us"))
    perType.crossJoin(broadcast(anchor))
      .withColumn("staleness_us", col("corpus_max_us") - col("last_event_us"))
      .withColumn("is_stale", col("staleness_us") > staleAfterUs)
  }

  /** Point-in-time (PIT) join: each fact row joined to the SCD2 dimension
    * VERSION that was valid at the fact's timestamp — "which customer
    * state did this order see", the query SCD2 history exists to answer.
    * Purchases play the facts; [[scd2History]] plays the versioned
    * dimension. The plan is an equi-join on the entity key with the
    * half-open interval check (`valid_from ≤ ts < valid_to`) as a residual
    * predicate: per-key work is bounded by versions-per-key × facts-per-
    * key, so the single key-shuffle survives any corpus size — no range
    * explosion, no BroadcastNestedLoopJoin. Intervals partition each key's
    * timeline, so every fact matches exactly one version.
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val hist = scd2History(spark, dir)
      .select(col("user_id"), col("event_id").as("v_event_id"),
        col("operation").as("v_op"), col("value").as("v_value"),
        col("valid_from_us"), col("valid_to_us"))
    val facts = log(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("seq_us").as("p_ts_us"))
    facts.join(hist,
        Seq("user_id").map(k => facts(k) === hist(k)).reduce(_ && _)
          && col("p_ts_us") >= col("valid_from_us")
          && col("p_ts_us") < col("valid_to_us"))
      .select(col("p_event_id"), facts("user_id"), col("p_ts_us"),
        col("v_event_id"), col("v_op"), col("v_value"), col("valid_from_us"))
  }

  /** CDC apply reconciliation — the pt-table-checksum pattern: source and
    * applied-target states compared per hash BUCKET with row counts and
    * order-independent integer checksums, so a mismatch localizes to
    * 1/16th of the keyspace instead of "somewhere in 100 TB". Here the
    * source truth is [[snapshotMerge]] and the target is the same state
    * with injected drift (a deterministic value perturbation + dropped
    * rows) so the audit demonstrably CATCHES divergence; in production the
    * two sides run on different systems and only the tiny per-bucket
    * digest frames travel. All checksum arithmetic is exact integer
    * (DECIMAL cents folded into a keyed linear hash) — no float summation
    * order to drift cross-engine.
    */
  def reconcile(spark: SparkSession, dir: String): DataFrame = {
    val src = snapshotMerge(spark, dir)
    // injected target drift: one corrupted value band + one dropped band
    val tgt = src
      .withColumn("value",
        when(col("user_id") % 97 === 13, round(col("value") + lit(1.0), 2))
          .otherwise(col("value")))
      .filter(col("user_id") % 113 =!= 7)
    def digest(df: DataFrame, side: String): DataFrame =
      df.withColumn("bucket", col("user_id") % 16)
        .withColumn("cents", (col("value").cast(DecimalType(14, 2)) * 100).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(s"rows_$side"),
          sum(col("user_id") * 1000003L + col("cents")).as(s"check_$side"))
    digest(src, "src").join(digest(tgt, "tgt"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("rows_src"), lit(0L)).as("rows_src"),
        coalesce(col("rows_tgt"), lit(0L)).as("rows_tgt"),
        coalesce(col("check_src"), lit(0L)).as("check_src"),
        coalesce(col("check_tgt"), lit(0L)).as("check_tgt"))
      .withColumn("consistent",
        col("rows_src") === col("rows_tgt") && col("check_src") === col("check_tgt"))
  }

  /** #228 SCD2 history compaction: collapse CONSECUTIVE versions whose
    * tracked attribute never changed (no-op UPDATEs — the dominant row
    * mass in chatty CDC feeds) into one interval spanning the run. Runs
    * found by the gaps-and-islands flag-cumsum over the existing per-key
    * ordering — the window sort is the same one [[scd2History]] already
    * pays, and the output intervals tile exactly like the input's. The
    * storage-hygiene job that keeps a 100 TB history table proportional
    * to REAL change, not to feed chatter.
    */
  def scd2Compact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("valid_from_us"), col("event_id"))
    scd2History(spark, dir)
      .withColumn("chg",
        when(!(lag(col("value"), 1).over(w) <=> col("value")) ||
          !(lag(col("operation"), 1).over(w) <=> col("operation")), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "run")
      .agg(min(col("valid_from_us")).as("valid_from_us"),
        max(col("valid_to_us")).as("valid_to_us"),
        first(col("operation")).as("operation"),
        first(col("value")).as("value"),
        count(lit(1)).as("n_collapsed"),
        max(col("is_current")).as("is_current"))
      .select("user_id", "operation", "value", "valid_from_us", "valid_to_us",
        "n_collapsed", "is_current")
  }

  /** #246 Tombstone GC audit: keys whose LAST change is a DELETE older
    * than the retention horizon are fully purgeable — their whole history
    * chain can leave the 100 TB store (the DELETE marker itself included;
    * Kafka-compaction's tombstone TTL, applied to the history table). The
    * horizon anchors to the newest event in the data (reproducible — no
    * wall clock); output sizes the reclaim per entity type before anyone
    * rewrites anything.
    */
  def tombstoneGc(spark: SparkSession, dir: String,
      retentionUs: Long = 7L * 86400000000L): DataFrame = {
    val l = log(spark, dir)
    val horizon = l.agg(max(col("seq_us")).as("mx"))
      .select((col("mx") - retentionUs).as("horizon"))
    val w = Window.partitionBy("user_id").orderBy(col("seq_us").desc, col("event_id").desc)
    val lastOp = l
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("entity_type"),
        col("operation").as("last_op"), col("seq_us").as("last_us"))
    val perUser = l.groupBy("user_id").agg(count(lit(1)).as("chain_rows"))
    lastOp.join(perUser, "user_id").crossJoin(broadcast(horizon))
      .groupBy("entity_type")
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("last_op") === "DELETE", 1L).otherwise(0L)).as("n_tombstoned"),
        sum(when(col("last_op") === "DELETE" && col("last_us") < col("horizon"), 1L)
          .otherwise(0L)).as("n_purgeable"),
        sum(when(col("last_op") === "DELETE" && col("last_us") < col("horizon"),
          col("chain_rows")).otherwise(0L)).as("rows_reclaimable"))
  }

  /** #229 Snapshot diff: the net entity-level movement between two points
    * in time, answered FROM THE HISTORY (no stored snapshots): as-of
    * states at T₁ and T₂ full-outer-join on the key, classify
    * added/removed/changed/unchanged, aggregate counts + exact-decimal
    * value deltas per status. The "what changed since last week" audit
    * every warehouse asks of its dimensions. T₁ = [[TimeTravelUs]],
    * T₂ = T₁ + 7 days.
    */
  val SnapshotDiffT2Us: Long = TimeTravelUs + 7L * 86400000000L

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    def asOf(t: Long): DataFrame = scd2History(spark, dir)
      .filter(col("valid_from_us") <= t && col("valid_to_us") > t &&
        col("operation") =!= "DELETE")
      .select(col("user_id"), round(col("value"), 2).as("v"))
    val d = org.apache.spark.sql.types.DecimalType(12, 2)
    asOf(TimeTravelUs).withColumnRenamed("v", "v1")
      .join(asOf(SnapshotDiffT2Us).withColumnRenamed("v", "v2"),
        Seq("user_id"), "full_outer")
      .withColumn("status",
        when(col("v1").isNull, "added")
          .when(col("v2").isNull, "removed")
          .when(col("v1") === col("v2"), "unchanged")
          .otherwise("changed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_entities"),
        round(sum(coalesce(col("v2").cast(d), lit(0).cast(d)) -
          coalesce(col("v1").cast(d), lit(0).cast(d))), 2)
          .cast("double").as("net_value_delta"))
  }

  /** #294 Op-sequence legality audit — a binlog replay is only trustworthy
    * if each key's op chain is grammatical: the first op for a key should
    * be a create, nothing but a re-create may follow a DELETE, and a
    * second INSERT without an intervening DELETE means the source emitted
    * a duplicate create (usually a snapshot/stream overlap, the exact bug
    * DBLog's watermark windows exist to prevent). One lag window per key
    * classifies every row; the violation census (class, rows, distinct
    * keys, first offending event for repro) is what an operator pages on.
    * Single user_id exchange; the census frame is ≤3 rows.
    */
  def opSequenceAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("seq_us"), col("event_id"))
    log(spark, dir)
      .withColumn("prev_op", lag(col("operation"), 1).over(w))
      .withColumn("violation",
        when(col("prev_op").isNull && col("operation") =!= "INSERT",
          "create_missing")
          .when(col("prev_op") === "DELETE" && col("operation") =!= "INSERT",
            "post_delete_mutation")
          .when(col("prev_op").isin("INSERT", "UPDATE") &&
            col("operation") === "INSERT", "duplicate_create"))
      .filter(col("violation").isNotNull)
      .groupBy("violation")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_keys"),
        min(col("event_id")).as("first_event_id"))
  }

  /** #295 DBLog-style incremental-snapshot interleave audit (Netflix DBLog
    * / Debezium incremental snapshots): a consistent initial load runs
    * CHUNKED key-range selects concurrently with the live change log, and
    * a snapshot row must be discarded whenever the log already carries a
    * newer event for its key — the chunk/watermark dedup rule. This batch
    * realization splits the envelope at the timeline midpoint t_mid:
    * "snapshot" = SCD1 state at t_mid (latest non-DELETE per key),
    * chunked by key range; "log" = events after t_mid. Per chunk it
    * reports rows selected, rows superseded by the log (the dedup rule
    * firing), log-born keys landing in the chunk's range, and final live
    * keys — and proves the merge is CONSISTENT: n_mismatch counts keys
    * where (snapshot ⊕ log-replay) disagrees with the direct SCD1 over
    * the full history, and must be 0 everywhere. Three aggregations on
    * the same user_id hash partitioning + one tiny broadcast of t_mid;
    * chunk granularity is a pure projection of the key, so the audit
    * frame is ~keys/chunkSize rows at any scale.
    */
  def incrementalSnapshot(spark: SparkSession, dir: String,
      chunkSize: Long = 100L): DataFrame = {
    val l = log(spark, dir)
    val mid = l.agg(min(col("seq_us")).as("lo"), max(col("seq_us")).as("hi"))
      .select(expr("(lo + hi) DIV 2").as("t_mid"))
    val withMid = l.crossJoin(broadcast(mid))
    def scd1Of(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("seq_us").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("operation") =!= "DELETE")
        .select(col("user_id"), col("seq_us"), col("value"))
    }
    val snapshot = scd1Of(withMid.filter(col("seq_us") <= col("t_mid")))
    val logSide = withMid.filter(col("seq_us") > col("t_mid"))
    val logFinal = scd1Of(logSide)
    val logKeys = logSide.select("user_id").distinct()
    // merged = snapshot rows NOT superseded by any log event, plus the
    // log's own final states — exactly what the chunk dedup rule yields
    val kept = snapshot.join(logKeys, Seq("user_id"), "left_anti")
    val merged = kept.unionByName(logFinal)
    val direct = scd1Of(withMid)
    val parity = merged.withColumnRenamed("seq_us", "m_seq")
      .withColumnRenamed("value", "m_val")
      .join(direct.withColumnRenamed("seq_us", "d_seq")
        .withColumnRenamed("value", "d_val"), Seq("user_id"), "full_outer")
      .withColumn("mismatch",
        when(col("m_seq").isNull || col("d_seq").isNull ||
          col("m_seq") =!= col("d_seq") || col("m_val") =!= col("d_val"), 1L)
          .otherwise(0L))
    val snapStats = snapshot
      .join(logKeys.withColumn("superseded", lit(1L)), Seq("user_id"), "left")
      .groupBy(expr(s"user_id DIV $chunkSize").as("chunk_id"))
      .agg(count(lit(1)).as("n_snapshot"),
        sum(coalesce(col("superseded"), lit(0L))).as("n_superseded"))
    val parStats = parity
      .groupBy(expr(s"user_id DIV $chunkSize").as("chunk_id"))
      .agg(sum(when(col("m_seq").isNotNull, 1L).otherwise(0L)).as("n_final"),
        sum(col("mismatch")).as("n_mismatch"))
    snapStats.join(parStats, Seq("chunk_id"), "full_outer")
      .select(col("chunk_id"),
        coalesce(col("n_snapshot"), lit(0L)).as("n_snapshot"),
        coalesce(col("n_superseded"), lit(0L)).as("n_superseded"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"))
  }

  /** #306 The [[asofJoin]] query through the custom merge exec
    * ([[graft.plans.AsOfJoinOp.asofJoinExec]]): same frames, same
    * semantics, same DuckDB ASOF JOIN oracle — the physical operator is
    * proven against both the SQL oracle and the union+window path.
    */
  def asofJoinViaExec(spark: SparkSession, dir: String,
      tolerance: Option[Long] = None): DataFrame = {
    val lg = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
    val left = lg.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val right = lg.filter(col("event_type") =!= "purchase")
      .select(col("event_id").as("r_event_id"), col("user_id"),
        col("ts_us").as("r_ts_us"), col("value").as("r_value"))
    graft.plans.AsOfJoinOp.asofJoinExec(left, right, keyCols = Seq("user_id"),
      leftTime = "ts_us", rightTime = "r_ts_us",
      carryCols = Seq("r_event_id", "r_ts_us", "r_value"),
      tiebreak = Seq("r_event_id"), tolerance = tolerance)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_r_event_id").as("prior_event_id"),
        col("asof_r_ts_us").as("prior_ts_us"),
        round(col("asof_r_value"), 2).as("prior_value"),
        (col("ts_us") - col("asof_r_ts_us")).as("wait_us"))
  }

  /** #303 Join-view IVM delta audit — the JOIN-view counterpart of the
    * aggregate IVM in [[ivmAudit]]: for an insert-only view J = A ⋈ B,
    * the incremental update is the three-term delta algebra
    * ΔJ = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB (disjoint by membership, so the
    * fold is a plain union — no dedup pass). Here A = orders,
    * B = customer, and the old/delta split is a deterministic key
    * predicate standing in for the batch boundary. Each term runs as its
    * OWN broadcast-hash join — exactly how production IVM executes,
    * where ΔA/ΔB are small fresh files and the delta terms read only
    * them, never the accumulated bulk — and the audit column proves the
    * fold: mismatch = |direct A⋈B| − Σ|terms| per nation, computed from
    * Spark's own independent joins and pinned to 0 by the oracle. Dim
    * sides broadcast; the aggregate frame is nation-sized.
    */
  def ivmJoinDelta(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val oldO = o.filter(col("o_orderkey") % 4 =!= 0)
    val dO = o.filter(col("o_orderkey") % 4 === 0)
    val oldC = c.filter(col("c_custkey") % 5 =!= 0)
    val dC = c.filter(col("c_custkey") % 5 === 0)
    def term(a: DataFrame, b: DataFrame, name: String): DataFrame =
      a.join(broadcast(b), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as(name))
    val folded = term(oldO, oldC, "n_old")
      .join(term(dO, oldC, "n_delta_a"), Seq("c_nationkey"), "full_outer")
      .join(term(oldO, dC, "n_delta_b"), Seq("c_nationkey"), "full_outer")
      .join(term(dO, dC, "n_delta_ab"), Seq("c_nationkey"), "full_outer")
    term(o, c, "n_view")
      .join(folded, Seq("c_nationkey"), "left")
      .select(col("c_nationkey"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_delta_a"), lit(0L)).as("n_delta_a"),
        coalesce(col("n_delta_b"), lit(0L)).as("n_delta_b"),
        coalesce(col("n_delta_ab"), lit(0L)).as("n_delta_ab"),
        col("n_view"))
      .withColumn("mismatch",
        col("n_view") - col("n_old") - col("n_delta_a") -
          col("n_delta_b") - col("n_delta_ab"))
  }

  /** #319 Incremental TOP-K maintenance under CDC deltas — the ranked
    * leaderboard as a maintained view. The maintained state is the
    * per-user net-cents summary plus its top-(k+buffer) head; a delta
    * batch (signed: DELETE retracts) updates ONLY the touched users and
    * re-ranks the candidate set = stored head ∪ touched. That is exact
    * unless deletions could promote an untouched user from below the
    * buffer: detected by comparing the best untouched non-candidate
    * total against the new k-th total (ties INCLUDED — the user_id
    * tiebreak can promote an equal-cents outsider), in which case the
    * view falls back to one full re-rank (the REFILL every bounded-state
    * top-k maintenance scheme needs; Space-Saving in
    * [[graft.streaming.SketchStream]] is the no-refill approximate
    * alternative). Batch boundary = midpoint of the sequence range, so
    * the oracle replays the identical split.
    *
    * Scale: summary update + candidate join shuffle on user_id (delta-
    * sized); top selection is TakeOrdered (partial per-partition top-k,
    * never a global sort); driver sees only the k-row head and one
    * 1-row outside-max aggregate.
    */
  def topkIvm(spark: SparkSession, dir: String, k: Int = 10,
      buffer: Int = 10): DataFrame = {
    val lg = log(spark, dir).select(col("user_id"), col("seq_us"),
      when(col("operation") === "DELETE", -1L).otherwise(1L).as("sign"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val pivot = lg.agg(expr("(min(seq_us) + max(seq_us)) DIV 2").as("p"))
    val split = lg.crossJoin(broadcast(pivot))
    val base = split.filter(col("seq_us") <= col("p"))
    val delta = split.filter(col("seq_us") > col("p"))
    val summary = base.groupBy("user_id")
      .agg(sum(col("sign") * col("cents")).as("cents"))
      .localCheckpoint() // the maintained MV: read by head, join, and outside-max
    val head = summary.orderBy(col("cents").desc, col("user_id"))
      .limit(k + buffer)
    val touched = delta.groupBy("user_id")
      .agg(sum(col("sign") * col("cents")).as("dcents"))
    val updatedTouched = touched.join(summary, Seq("user_id"), "left")
      .select(col("user_id"),
        (coalesce(col("cents"), lit(0L)) + col("dcents")).as("cents"))
    val candidates = head.join(updatedTouched.select("user_id"), Seq("user_id"), "left_anti")
      .unionByName(updatedTouched)
    val candTop = candidates.orderBy(col("cents").desc, col("user_id"))
      .limit(k).collect() // bounded: k rows
    val threshold = if (candTop.length < k) Long.MinValue
      else candTop.last.getAs[Long]("cents")
    val outsideMax = summary
      .join(candidates.select("user_id"), Seq("user_id"), "left_anti")
      .agg(max(col("cents")).as("m")).collect().head // bounded: 1 row
    val refill = !outsideMax.isNullAt(0) && outsideMax.getAs[Long]("m") >= threshold
    val topk =
      if (refill) {
        val full = summary.join(touched, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L))).as("cents"))
        full.orderBy(col("cents").desc, col("user_id")).limit(k)
      } else {
        import spark.implicits._
        candTop.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cents")))
          .toSeq.toDF("user_id", "cents")
      }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cents").desc, col("user_id")) // k-row frame only
    topk.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("refill", lit(if (refill) 1L else 0L))
      .select("rnk", "user_id", "cents", "refill")
  }

  /** #322 Multi-source field-level LWW merge — two replicas of the same
    * entity stream (split deterministically; replica `a` outranks `b` at
    * equal timestamps, modeling a primary/standby pair) converge to one
    * row per entity where EACH FIELD independently keeps its last write:
    * the LWW-register-map CRDT every multi-region CDC fan-in resolves
    * with. Writer sets differ per field (field A: purchase/click, field
    * B: view/signup); a DELETE writes a tombstone (NULL) into both
    * registers. Total order = (seq_us, priority, event_id) — ties cannot
    * diverge across engines.
    *
    * Scale: two window branches sharing the user_id hash partitioning,
    * each a partial filter of the log — one shuffle each, merged by a
    * key-cardinality full-outer join. No state beyond the winner row.
    */
  def lwwMerge(spark: SparkSession, dir: String): DataFrame = {
    val lg = log(spark, dir)
      .withColumn("src", when(col("event_id") % 2 === 0, "a").otherwise("b"))
      .withColumn("prio", when(col("event_id") % 2 === 0, 2).otherwise(1))
    val w = Window.partitionBy("user_id")
      .orderBy(col("seq_us").desc, col("prio").desc, col("event_id").desc)
    def register(types: Seq[String], vOut: String, sOut: String): DataFrame =
      lg.filter(col("operation") === "DELETE" || col("event_type").isin(types: _*))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          round(when(col("operation") === "DELETE", lit(null)).otherwise(col("value")), 2)
            .as(vOut),
          col("src").as(sOut))
    register(Seq("purchase", "click"), "value_a", "src_a")
      .join(register(Seq("view", "signup"), "value_b", "src_b"),
        Seq("user_id"), "full_outer")
  }

  /** #388 `cdc_conflict_audit` — concurrent-write conflict detection, the
    * measurement that tells you whether [[lwwMerge]]'s tie-breaking is a
    * theoretical nicety or is actively dropping writes: per (entity,
    * 10-minute window by default — the eventual-consistency horizon a
    * multi-region audit cares about), flag windows where ≥2 DIFFERENT values
    * landed — the multi-master race a last-writer-wins resolver silently
    * collapses. Reports the contention census per entity: conflicted
    * buckets, total conflicting writes, worst bucket, and the value
    * divergence (min/max cents) inside the worst bucket. One (entity,
    * bucket) aggregate then one entity aggregate — both key-sized; no
    * pair joins, no range explosion.
    */
  def conflictAudit(spark: SparkSession, dir: String,
      windowUs: Long = 600000000L): DataFrame = {
    val buckets = graft.Tables.events(spark, dir)
      .selectExpr("user_id", s"(ts DIV 1000) DIV $windowUs AS win",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("user_id", "win")
      .agg(count(lit(1)).as("n_writes"),
        countDistinct(col("cents")).as("n_values"),
        min(col("cents")).as("min_c"), max(col("cents")).as("max_c"))
      .filter(col("n_values") > 1)
    buckets.groupBy("user_id")
      .agg(count(lit(1)).as("n_conflict_buckets"),
        sum(col("n_writes")).as("n_conflict_writes"),
        max(col("n_writes")).as("worst_bucket_writes"),
        max(col("max_c") - col("min_c")).as("max_divergence_c"))
  }

  /** #404 `cdc_op_mix_drift` — operation-mix drift per day: each day's
    * INSERT/UPDATE/DELETE share vs the corpus-wide mix as an exact ×10⁴
    * total-variation distance (cross-multiplied integers — Σ|day_op·N −
    * all_op·n| over 2·n·N, no per-share division), plus the day's
    * dominant op. The CDC health alarm [[throughput]] can't see: volume
    * stays flat while a delete storm or a backfill's INSERT wave rewrites
    * the mix. Day×op aggregate (bounded), then day-frame algebra; the
    * log is scanned once.
    */
  def opMixDrift(spark: SparkSession, dir: String): DataFrame = {
    val byDayOp = log(spark, dir)
      .selectExpr("seq_us DIV 86400000000 AS day", "operation")
      .groupBy("day", "operation")
      .agg(count(lit(1)).as("n_op"))
    val byDay = byDayOp.groupBy("day").agg(sum(col("n_op")).as("n_day"))
    val overall = byDayOp.groupBy("operation").agg(sum(col("n_op")).as("n_all"))
    // the corpus total derives LAZILY from the already-aggregated op mix
    // (a 1-row agg broadcast into the grid) — no second driver-side scan
    // of the log, and building this frame triggers no job
    val totalFrame = overall.agg(sum(col("n_all")).as("n_total"))
    // FULL day×op grid — a day missing an op entirely contributes its
    // |0 − q_op| mass (the langDrift zero-cells rule; a pure-DELETE day
    // must score maximal drift, not skip the other ops' terms). The grid's
    // op axis is a LITERAL 3-row frame (the op domain is closed by
    // [[log]]'s when/otherwise mapping), so the cross join is
    // shape-bounded (3× amplification at any scale) and `overall`'s
    // per-op totals attach by broadcast HASH join, not a nested loop.
    import spark.implicits._
    val opAxis = Seq("INSERT", "UPDATE", "DELETE").toDF("operation")
    byDayOp.select("day").distinct()
      .crossJoin(broadcast(opAxis))
      .join(broadcast(overall), Seq("operation"), "inner")
      .join(byDayOp, Seq("day", "operation"), "left").na.fill(0L, Seq("n_op"))
      .join(byDay, "day")
      .crossJoin(broadcast(totalFrame))
      .groupBy("day")
      .agg(max(col("n_day")).as("n_events"),
        // Σ|day_op/n_day − all_op/N| computed as integers over 2·n_day·N
        sum(abs(expr("CAST(n_op AS DECIMAL(38,0)) * n_total - " +
          "CAST(n_all AS DECIMAL(38,0)) * n_day"))).as("num"),
        max(col("n_total")).as("n_total"),
        max(expr("CASE WHEN n_op * 2 > n_day THEN operation END"))
          .as("majority_op"))
      .selectExpr("day", "n_events",
        "CAST(num * 10000 DIV (2 * CAST(n_events AS DECIMAL(38,0)) * n_total) AS BIGINT) AS tvd_e4",
        "majority_op")
  }

  /** DuckDB oracle for [[lwwMerge]]: identical per-field winner windows. */
  def lwwMergeOracle(logCte: String): String =
    s"""$logCte,
       |lg AS (SELECT *, CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS src,
       |    CASE WHEN event_id % 2 = 0 THEN 2 ELSE 1 END AS prio FROM log),
       |wa AS (SELECT user_id,
       |    round(CASE WHEN operation = 'DELETE' THEN NULL ELSE value END, 2) AS value_a,
       |    src AS src_a,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY seq_us DESC, prio DESC, event_id DESC) AS rn
       |  FROM lg WHERE operation = 'DELETE' OR event_type IN ('purchase', 'click')),
       |wb AS (SELECT user_id,
       |    round(CASE WHEN operation = 'DELETE' THEN NULL ELSE value END, 2) AS value_b,
       |    src AS src_b,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY seq_us DESC, prio DESC, event_id DESC) AS rn
       |  FROM lg WHERE operation = 'DELETE' OR event_type IN ('view', 'signup'))
       |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       |  a.value_a, a.src_a, b.value_b, b.src_b
       |FROM (SELECT * FROM wa WHERE rn = 1) a
       |FULL OUTER JOIN (SELECT * FROM wb WHERE rn = 1) b ON a.user_id = b.user_id""".stripMargin

  /** DuckDB oracle for [[topkIvm]]: full recompute of the ranked head
    * (which the incremental path must equal by construction) plus the
    * same refill-detection algebra replayed over the same split.
    */
  def topkIvmOracle(k: Int = 10, buffer: Int = 10): String =
    s"""WITH lg AS (SELECT user_id, epoch_us(ts) AS seq_us,
       |    CASE WHEN event_type = 'error' THEN -1 ELSE 1 END AS sign,
       |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       |p AS (SELECT (min(seq_us) + max(seq_us)) // 2 AS pv FROM lg),
       |base AS (SELECT user_id, sum(sign * cents) AS cents
       |  FROM lg, p WHERE seq_us <= pv GROUP BY 1),
       |delta AS (SELECT user_id, sum(sign * cents) AS dcents
       |  FROM lg, p WHERE seq_us > pv GROUP BY 1),
       |head AS (SELECT user_id, cents FROM base
       |  ORDER BY cents DESC, user_id LIMIT ${k + buffer}),
       |ut AS (SELECT d.user_id, COALESCE(b.cents, 0) + d.dcents AS cents
       |  FROM delta d LEFT JOIN base b USING (user_id)),
       |cand AS (SELECT * FROM ut UNION ALL
       |  SELECT * FROM head WHERE user_id NOT IN (SELECT user_id FROM ut)),
       |ctop AS (SELECT cents FROM cand ORDER BY cents DESC, user_id LIMIT $k),
       |thr AS (SELECT CASE WHEN (SELECT count(*) FROM ctop) < $k
       |    THEN -9223372036854775808 ELSE (SELECT min(cents) FROM ctop) END AS t),
       |om AS (SELECT max(cents) AS m FROM base
       |  WHERE user_id NOT IN (SELECT user_id FROM cand)),
       |rf AS (SELECT CASE WHEN m IS NOT NULL AND m >= t THEN 1 ELSE 0 END AS refill
       |  FROM om, thr),
       |fl AS (SELECT COALESCE(b.user_id, d.user_id) AS user_id,
       |    COALESCE(b.cents, 0) + COALESCE(d.dcents, 0) AS cents
       |  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id)
       |SELECT CAST(row_number() OVER (ORDER BY cents DESC, user_id) AS BIGINT) AS rnk,
       |  user_id, CAST(cents AS BIGINT) AS cents, CAST(refill AS BIGINT) AS refill
       |FROM fl, rf ORDER BY cents DESC, user_id LIMIT $k""".stripMargin
}
