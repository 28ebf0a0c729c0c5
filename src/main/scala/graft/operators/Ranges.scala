package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.cdc.Cdc

/** Point-in-interval (range) joins that scale.
  *
  * Spark's planner turns a bare inequality join into
  * BroadcastNestedLoopJoin (or a cartesian product) — O(n·m) row
  * comparisons, dead at 100 TB. Bucketizing converts it to an EQUI-join:
  * intervals explode into the fixed-width buckets they overlap, points map
  * to their single bucket, the join runs hash-partitioned on
  * (keys…, bucket), and the exact range predicate applies as a residual
  * filter. A (point, interval) pair can only meet in the point's bucket,
  * so no dedup pass is needed. Work scales with rows × (interval_width /
  * bucket_width), tunable per workload.
  */
object Ranges {

  /** Generic bucketized range join. `keyCols` must exist on both sides
    * (equi keys); `pointCol` ∈ [`loCol`, `hiCol`] is the residual. Bucket
    * width should be ≈ the typical interval width: each interval then
    * explodes into ~2 buckets.
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    val ivb = intervals.withColumn("__bucket",
      explode(expr(s"sequence($loCol DIV $bucketWidth, $hiCol DIV $bucketWidth)")))
    val ptb = points.withColumn("__bucket", expr(s"$pointCol DIV $bucketWidth"))
    ptb.join(ivb, keyCols :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join, bucketized: overlap (a.lo ≤ b.hi ∧
    * b.lo ≤ a.hi) becomes an equi-join on (keys…, bucket) because two
    * overlapping intervals necessarily share every bucket their
    * intersection touches — the candidate pair is generated ONCE by
    * keeping only the intersection's FIRST bucket (greatest of the two
    * start buckets), so no distinct pass is needed. The residual applies
    * the exact predicate. The session×incident / outage×deploy alignment
    * primitive; nothing here nested-loops.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    val ab = a.withColumn("__bucket",
      explode(expr(s"sequence($aLo DIV $bucketWidth, $aHi DIV $bucketWidth)")))
    val bb = b.withColumn("__bucket",
      explode(expr(s"sequence($bLo DIV $bucketWidth, $bHi DIV $bucketWidth)")))
    ab.join(bb, keyCols :+ "__bucket")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      // emit each overlapping pair exactly once: only in the first shared
      // bucket of the overlap region
      .filter(col("__bucket") ===
        greatest(expr(s"$aLo DIV $bucketWidth"), expr(s"$bLo DIV $bucketWidth")))
      .drop("__bucket")
  }

  /** #288 Registered query: which user activity sessions overlap the same
    * user's error bursts — "was the session degraded". Sessions are
    * 30-minute-gap islands of non-error events; bursts are 5-minute-gap
    * islands of error events; both frames are session-cardinality (never
    * event-cardinality) before the bucketed overlap join. Output: one row
    * per overlapping (session, burst) with the exact overlap span.
    */
  def sessionErrorOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def islands(df: DataFrame, gapUs: Long) = {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      df.withColumn("prev", lag(col("ts_us"), 1).over(w))
        .withColumn("new_island",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"),
          count(lit(1)).as("n_events"))
    }
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("ts_us"))
    // an interval stays OPEN until its inactivity gap elapses — the same
    // timeout that delimits the island delimits its live span, so a point
    // event is a gap-length interval, not a zero-width degenerate one
    val sessions = islands(ev.filter(col("event_type") =!= "error"), 1800000000L)
      .select(col("user_id"), col("lo").as("s_lo"),
        (col("hi") + 1800000000L).as("s_hi"), col("n_events").as("s_events"))
    val bursts = islands(ev.filter(col("event_type") === "error"), 300000000L)
      .select(col("user_id"), col("lo").as("b_lo"),
        (col("hi") + 300000000L).as("b_hi"), col("n_events").as("b_errors"))
    intervalOverlapJoin(sessions, bursts, Seq("user_id"),
      "s_lo", "s_hi", "b_lo", "b_hi", bucketWidth = 1800000000L)
      .select(col("user_id"), col("s_lo"), col("s_hi"), col("s_events"),
        col("b_lo"), col("b_hi"), col("b_errors"),
        (least(col("s_hi"), col("b_hi")) - greatest(col("s_lo"), col("b_lo")))
          .as("overlap_us"))
  }

  /** #97 Error blast-radius: for every DELETE (error) event, all of the
    * same user's events within ±5 minutes — the "what happened around the
    * failure" query every CDC operator runs. 10-minute intervals over
    * 5-minute buckets → each interval hits ≤ 3 buckets; the oracle states
    * it as a plain inequality join, which DuckDB's IEJoin handles but
    * Spark would nested-loop.
    */
  val WindowUs: Long = 300000000L // 5 minutes

  def errorBlastRadius(spark: SparkSession, dir: String): DataFrame = {
    val log = Cdc.log(spark, dir)
    val points = log.select(col("user_id"), col("seq_us"), col("value"))
    val intervals = log.filter(col("operation") === "DELETE")
      .select(col("event_id").as("err_event_id"), col("user_id"),
        (col("seq_us") - WindowUs).as("lo"), (col("seq_us") + WindowUs).as("hi"))
    bucketedRangeJoin(points, intervals, Seq("user_id"), "seq_us", "lo", "hi",
      bucketWidth = WindowUs)
      .groupBy("err_event_id")
      .agg(count(lit(1)).as("n_in_window"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)").as("window_value"))
  }
}
