package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Time-series regularization: the gap-fill / smoothing pass every
  * metrics store runs between raw events and dashboards (reference:
  * src/notebooks/demo/cdc_500_tables_streaming.py:366-425 renders
  * per-interval charts that silently skip empty intervals — these
  * operators make the series dense and smooth explicitly).
  *
  * Scale notes (100 TB):
  *  - the calendar spine is generated MAP-SIDE from one (min,max) row per
  *    entity (`sequence` + `explode`) — never a driver-side date range
  *    crossJoined against the entity list;
  *  - spine join, fill window, and EWMA window all share the entity-key
  *    partitioning, so the whole pass is ONE shuffle per input;
  *  - EWMA uses power-of-two decay in INTEGER arithmetic (cents × 2^j):
  *    bit-identical results on any engine/partitioning, no FP drift.
  */
object TimeSeries {

  private final val DayUs = 86400000000L

  /** #219 Per-user daily calendar spine + forward-fill: materialize every
    * day between the user's first and last activity, carry the last seen
    * daily value across gaps, flag the filled rows. The spine explodes
    * from a 2-number row per user; fill is one `last(ignoreNulls)` window
    * over the same user partitioning the daily aggregate already has.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("user_id", "day")
      .agg(round(sum(col("value").cast(DecimalType(12, 2))), 2)
        .cast("double").as("v"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val byUser = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_gap", when(col("v").isNull, 1L).otherwise(0L))
      .withColumn("value_filled", last(col("v"), ignoreNulls = true).over(byUser))
      .select("user_id", "day", "value_filled", "is_gap")
  }

  /** EWMA decay depth: weights 2^-1 … 2^-DepthK; terms beyond contribute
    * < 2^-16 of the scale and are cut EXACTLY (defined trailing window,
    * not an FP underflow accident).
    */
  final val DepthK = 16

  /** The lag-weighted numerator/denominator pair for the fixed-point EWMA:
    * N = Σ_j cents(t-j)·2^(K-1-j), D = Σ_j present(t-j)·2^(K-1-j).
    * All integers — both sums are exact on any engine.
    */
  private def ewmaTerms(w: org.apache.spark.sql.expressions.WindowSpec): (Column, Column) = {
    val terms = (0 until DepthK).map { j =>
      val weight = 1L << (DepthK - 1 - j)
      val c = lag(col("cents"), j).over(w)
      (coalesce(c, lit(0L)) * weight,
        when(c.isNull, 0L).otherwise(weight))
    }
    (terms.map(_._1).reduce(_ + _), terms.map(_._2).reduce(_ + _))
  }

  /** #220 Exponentially-weighted moving average of each user's event
    * values, EXACT fixed-point: per-event cents, power-of-two weights
    * 2^-1…2^-16, integer numerator/denominator summed over one lag
    * window, one correctly-rounded double divide at the end. Catalyst
    * evaluates all 16 lags in a single WindowExec over one sort — the
    * whole operator is one shuffle on user_id.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val (num, den) = ewmaTerms(w)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("ewma", round(num.cast("double") / den.cast("double") / 100.0, 4))
      .select("user_id", "event_id", "ts_us", "ewma")
  }

  /** The DuckDB oracle text for [[ewma]], generated from the same K so the
    * two engines cannot drift.
    */
  def ewmaOracle: String = {
    val num = (0 until DepthK).map { j =>
      val weight = 1L << (DepthK - 1 - j)
      s"COALESCE(lag(cents, $j) OVER w, 0) * $weight"
    }.mkString(" + ")
    val den = (0 until DepthK).map { j =>
      val weight = 1L << (DepthK - 1 - j)
      s"CASE WHEN lag(cents, $j) OVER w IS NULL THEN 0 ELSE $weight END"
    }.mkString(" + ")
    s"""WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
       |SELECT user_id, event_id, ts_us,
       |  round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE) / 100.0, 4) AS ewma
       |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin
  }
}
