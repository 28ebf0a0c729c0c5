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
