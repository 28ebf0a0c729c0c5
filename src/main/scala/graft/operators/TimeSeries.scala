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

  /** #230 Per-type OLS trend line over the daily series, EXACT integer /
    * decimal arithmetic end-to-end: x = day offset, y = daily cents; the
    * normal-equation terms (nΣxy − ΣxΣy, nΣx² − (Σx)²) are decimal
    * products of integer sums — no FP at any step, so slope_e6/r2_e4 are
    * bit-identical on any engine/partitioning (sign split keeps the
    * truncating DIV away from negative numerators, where engines disagree
    * floor-vs-truncate). One shuffle: the daily aggregate; the regression
    * itself runs on type×day rows.
    */
  def trend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min(col("day")).as("d0"),
        sum(col("day")).as("sx_raw"),
        expr("sum(CAST(day AS DECIMAL(38,0)) * CAST(day AS DECIMAL(38,0)))").as("sxx_raw"),
        expr("sum(CAST(cents AS DECIMAL(38,0)))").as("sy"),
        expr("sum(CAST(day AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))").as("sxy_raw"),
        expr("sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))").as("syy"))
      // shift x by d0 AFTER aggregation (pure algebra on the sums) so the
      // quadratic terms stay small: Σ(x-d0) = Σx − n·d0, etc.
      .withColumn("sx", expr("CAST(sx_raw AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0)) * d0"))
      .withColumn("sxx", expr(
        "sxx_raw - 2 * d0 * CAST(sx_raw AS DECIMAL(38,0)) + CAST(n AS DECIMAL(38,0)) * d0 * d0"))
      .withColumn("sxy", expr("sxy_raw - d0 * sy"))
      .withColumn("num", expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy"))
      .withColumn("den", expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx"))
      .withColumn("deny", expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy"))
      .select(col("event_type"), col("n").as("n_days"),
        when(col("den") === 0, lit(null).cast("long")).otherwise(
          expr("CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 DIV den) " +
            "ELSE (num * 1000000 DIV den) END AS BIGINT)")).as("slope_e6"),
        when(expr("den * deny") === 0, lit(null).cast("long")).otherwise(
          expr("CAST((num * num * 10000) DIV (den * deny) AS BIGINT)")).as("r2_e4"))
  }

  /** #231 Day-of-week seasonality profile: each (type, dow)'s mean daily
    * mass as an EXACT ×10⁴ ratio to the type's overall mean daily mass —
    * cross-multiplied integer arithmetic (t_dow·days_all·10⁴ ÷
    * days_dow·t_all), no division until the last step, engine-exact.
    * dow 0=Sunday (epoch day 0 was a Thursday → +4).
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val byDow = daily
      .groupBy(col("event_type"), expr("(day + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("days_dow"), sum(col("cents")).as("t_dow"))
    // overall totals fold FROM the (types × 7)-sized dow frame — the daily
    // aggregate (and the events scan under it) runs exactly once
    val overall = byDow.groupBy("event_type")
      .agg(sum(col("days_dow")).as("days_all"), sum(col("t_dow")).as("t_all"))
    byDow.join(overall, "event_type")
      .select(col("event_type"), col("dow"), col("days_dow"), col("t_dow"),
        when(col("t_all") === 0, lit(null).cast("long")).otherwise(expr(
          "CAST(CAST(t_dow AS DECIMAL(38,0)) * days_all * 10000 DIV " +
            "(CAST(days_dow AS DECIMAL(38,0)) * t_all) AS BIGINT)")).as("ratio_e4"))
  }

  /** #265 Seasonally-adjusted anomaly detection: daily cents totals per
    * type minus the type's same-day-of-week integer mean, then
    * median/MAD fences over the RESIDUALS — so a strong weekly cycle
    * doesn't trip the alarm that a raw-total fence would (every Sunday
    * would flag) and a genuinely bad Tuesday still does. Composes the
    * [[seasonality]] dow frame with [[graft.operators.Events.anomalyMad]]'s
    * robust-fence pattern; the per-type frames are calendar-bounded
    * (≤ days in window), so the broadcasts stay tiny at any corpus size.
    */
  def residualAnomaly(spark: SparkSession, dir: String, k: Double = 5.0): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val byDow = daily.groupBy(col("event_type"), expr("(day + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("days_dow"), sum(col("cents")).as("t_dow"))
    val resid = daily.withColumn("dow", expr("(day + 4) % 7"))
      .join(broadcast(byDow), Seq("event_type", "dow"))
      .withColumn("mean_dow", expr("t_dow DIV days_dow"))
      .withColumn("residual", col("cents") - col("mean_dow"))
    val med = resid.groupBy("event_type")
      .agg(expr("round(percentile(residual, 0.5D), 4)").as("med_r"))
    val dev = resid.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("residual") - col("med_r")))
    val mad = dev.groupBy("event_type")
      .agg(expr("round(percentile(absdev, 0.5D), 4)").as("mad_r"))
    dev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("dow"), col("cents"),
        col("mean_dow"), col("residual"), col("med_r"), col("mad_r"))
      .withColumn("is_anomaly",
        (col("mad_r") > 0 &&
          abs(col("residual") - col("med_r")) > lit(k) * col("mad_r")).cast("long"))
  }

  /** #242 Daily percentile bands (P50/P95 of event value per day) from
    * the mergeable KLL-style sketch aggregate — the latency/value SLO
    * band chart. O(k log n) state per day, map-side partial merge, no
    * per-day distributed sort; the same sketch bytes could persist as a
    * quantile INDEX next to the HLL one and merge across arbitrary date
    * ranges.
    */
  def percentileBands(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(expr(s"(ts DIV 1000) DIV $DayUs").as("day"), col("value"))
      .groupBy("day")
      .agg(graft.functions.QuantileSketchAgg
        .quantileSketch(col("value"), Seq(0.5, 0.95)).as("qs"),
        count(lit(1)).as("n_events"))
      .select(col("day"),
        round(element_at(col("qs"), 1), 4).as("p50_est"),
        round(element_at(col("qs"), 2), 4).as("p95_est"),
        col("n_events"))

  /** #267 Autocorrelation of the daily per-type series at lags 1..maxLag:
    * the "does last week predict this week" readout that decides whether a
    * forecast (or a seasonality adjustment) is worth running at all. The
    * lag pairing is calendar-based (day, day+L), inner — a missing day
    * drops the pair on both engines identically. All Pearson cross-terms
    * (nΣxy−ΣxΣy, nΣx²−(Σx)², nΣy²−(Σy)²) are EXACT DECIMAL(38,0) products
    * of integer cents; only the final ρ division/sqrt runs in double, in
    * IDENTICAL SQL text on both engines (the [[Events.moments]] pattern).
    *
    * Scale: the daily frame is calendar-bounded (types × days), so the
    * ×maxLag fan-out and the self-join are over a frame that stays tiny at
    * ANY corpus size — the only corpus-scale work is the one daily
    * aggregate every other ts_* operator already shares.
    */
  def acf(spark: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // the self-join references the daily frame twice — an eager
    // localCheckpoint materializes the calendar-bounded frame ONCE, so
    // the corpus-scale events scan + aggregate never replays per branch
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .localCheckpoint()
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag_d"))
    // x side fans out by the (tiny, broadcast) lag list; y side is the
    // same daily frame matched at day + lag
    val x = daily.join(broadcast(lags))
      .select(col("event_type"), col("lag_d"), (col("day") + col("lag_d")).as("day_y"),
        col("cents").as("cx"))
    val y = daily.select(col("event_type"), col("day").as("day_y"), col("cents").as("cy"))
    x.join(y, Seq("event_type", "day_y"))
      .groupBy("event_type", "lag_d")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(CAST(cx AS DECIMAL(38,0)))").as("sx"),
        expr("sum(CAST(cy AS DECIMAL(38,0)))").as("sy"),
        expr("sum(CAST(cx AS DECIMAL(38,0)) * cx)").as("sxx"),
        expr("sum(CAST(cy AS DECIMAL(38,0)) * cy)").as("syy"),
        expr("sum(CAST(cx AS DECIMAL(38,0)) * cy)").as("sxy"))
      .withColumn("num", expr("CAST(n_pairs AS DECIMAL(38,0)) * sxy - sx * sy"))
      .withColumn("denx", expr("CAST(n_pairs AS DECIMAL(38,0)) * sxx - sx * sx"))
      .withColumn("deny", expr("CAST(n_pairs AS DECIMAL(38,0)) * syy - sy * sy"))
      .select(col("event_type"), col("lag_d"), col("n_pairs"),
        expr("CASE WHEN denx <= 0 OR deny <= 0 THEN NULL ELSE " +
          "round(CAST(num AS DOUBLE) / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 4) " +
          "END").as("rho"))
  }

  /** #268 CUSUM level-shift detection over the daily per-type series,
    * EXACT integer arithmetic end-to-end. The textbook recursion
    * S_t = max(0, S_{t-1} + y_t) is not window-expressible, but its
    * closed form is: S_t = c_t − min(0, min_{j≤t} c_j) where c is the
    * running sum of y — two frames over ONE sort per type. Deviations are
    * against the integer-rounded MEDIAN (a mean target lets one spike
    * poison every other day's deviation); the slack (MAD/2) and alarm
    * threshold (h·MAD) come from the integer-rounded median absolute
    * deviation, so every downstream column is a bigint and the hash is
    * engine-exact. One shuffle (the daily aggregate); the CUSUM windows
    * run on the calendar-bounded frame.
    */
  def cusum(spark: SparkSession, dir: String, h: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // daily feeds the target probe, the MAD probe, and the final frame —
    // checkpoint once (calendar-bounded) so events is scanned ONCE
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .localCheckpoint()
    val mu = daily.groupBy("event_type")
      .agg(expr("CAST(round(percentile(cents, 0.5D)) AS BIGINT)").as("target_c"))
    val dev = daily.join(broadcast(mu), "event_type")
      .withColumn("dev", col("cents") - col("target_c"))
    val mad = dev.groupBy("event_type")
      .agg(expr("CAST(round(percentile(abs(dev), 0.5D)) AS BIGINT)").as("mad_c"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev.join(broadcast(mad), "event_type")
      .withColumn("cu", sum(col("dev") - expr("mad_c DIV 2")).over(w))
      .withColumn("cd", sum(-col("dev") - expr("mad_c DIV 2")).over(w))
      .withColumn("cusum_up", col("cu") - least(min(col("cu")).over(w), lit(0L)))
      .withColumn("cusum_dn", col("cd") - least(min(col("cd")).over(w), lit(0L)))
      .select(col("event_type"), col("day"), col("cents"), col("target_c"),
        col("dev"), col("mad_c"), col("cusum_up"), col("cusum_dn"),
        (col("mad_c") > 0 &&
          (col("cusum_up") > lit(h.toLong) * col("mad_c") ||
            col("cusum_dn") > lit(h.toLong) * col("mad_c"))).cast("long").as("alarm"))
  }

  /** #300 Threshold alert episodes with debounce — the page-the-oncall
    * layer above the raw anomaly fences: a day BREACHES when its count
    * exceeds the type's P90 daily count (exact interpolated percentile,
    * rounded to an integer so the compare is integral on both engines),
    * and consecutive breach days fuse into one EPISODE via the
    * day − row_number gaps-and-islands trick — one window per type.
    * `actionable` flags episodes of ≥2 consecutive days (single-day
    * spikes are visible but debounced — exactly what stops alert
    * fatigue without hiding data). Per episode: span, length, peak day
    * count, total excess over threshold. The daily frame is
    * calendar×types-bounded, so every window here is safe at any raw
    * event scale; raw events are touched in exactly ONE aggregation.
    */
  def alertEpisodes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val thr = daily.groupBy("event_type")
      .agg(expr("CAST(round(percentile(n, 0.9D)) AS BIGINT)").as("p90"))
    val breach = daily.join(broadcast(thr), "event_type")
      .filter(col("n") > col("p90"))
    val w = Window.partitionBy("event_type").orderBy("day")
    breach
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("event_type", "island")
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("n_days"), max(col("n")).as("peak_n"),
        max(col("p90")).as("p90"),
        sum(col("n") - col("p90")).as("excess"))
      .select(col("event_type"), col("start_day"), col("end_day"),
        col("n_days"), col("peak_n"), col("p90"), col("excess"),
        (col("n_days") >= 2).cast("long").as("actionable"))
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

  /** Brown's double-smoothing weights, truncated at [[DepthK]] lags:
    * single smooth S1 has weight 2^(K−1−j) at lag j (α = 1/2, the
    * [[ewma]] convention); the smooth-of-the-smooth S2 has weight
    * (j+1)·2^(K−1−j) — the closed form of EWMA∘EWMA, so NO recursion is
    * needed and both sums stay exact integers.
    */
  private def brownTerms(w: org.apache.spark.sql.expressions.WindowSpec)
      : (Column, Column, Column, Column) = {
    val terms = (0 until DepthK).map { j =>
      val w1 = 1L << (DepthK - 1 - j)
      val w2 = (j + 1L) * w1
      val c = lag(col("cents"), j).over(w)
      (coalesce(c, lit(0L)) * w1, when(c.isNull, 0L).otherwise(w1),
        coalesce(c, lit(0L)) * w2, when(c.isNull, 0L).otherwise(w2))
    }
    (terms.map(_._1).reduce(_ + _), terms.map(_._2).reduce(_ + _),
      terms.map(_._3).reduce(_ + _), terms.map(_._4).reduce(_ + _))
  }

  /** #304 Brown's double-exponential forecast over the per-type daily
    * series — level + trend, the simplest forecast that tracks drift
    * (plain EWMA lags a trending series by design; Brown's linear method
    * corrects with the smooth-of-the-smooth: level = 2S₁−S₂, trend =
    * S₁−S₂ at α = 1/2). No recursion anywhere: EWMA∘EWMA has a closed
    * form, so S₂ is just a second set of integer lag weights
    * ((j+1)·2^(K−1−j)) in the SAME window pass — both smooths are exact
    * integer numerator/denominator pairs, and the one double expression
    * at the end runs in identical text on both engines (the [[ewma]]
    * bit-parity recipe). One shuffle (the daily aggregate); the lag
    * window rides the calendar-bounded type×day frame.
    */
  def brownForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val (n1, d1, n2, d2) = brownTerms(w)
    daily
      .withColumn("n1", n1).withColumn("d1", d1)
      .withColumn("n2", n2).withColumn("d2", d2)
      .withColumn("s1", expr("CAST(n1 AS DOUBLE) / CAST(d1 AS DOUBLE)"))
      .withColumn("s2", expr("CAST(n2 AS DOUBLE) / CAST(d2 AS DOUBLE)"))
      .select(col("event_type"), col("day"), col("cents"),
        expr("round((2.0D * s1 - s2) / 100.0D, 4)").as("level"),
        expr("round((s1 - s2) / 100.0D, 4)").as("trend"),
        expr("round((2.0D * s1 - s2 + 7.0D * (s1 - s2)) / 100.0D, 4)")
          .as("forecast_7d"))
  }

  /** The DuckDB oracle for [[brownForecast]] — generated from the same
    * weight table and the same final expression text.
    */
  def brownOracle: String = {
    def sums(scale: Int => Long): (String, String) = {
      val num = (0 until DepthK).map { j =>
        s"COALESCE(lag(cents, $j) OVER w, 0) * ${scale(j)}"
      }.mkString(" + ")
      val den = (0 until DepthK).map { j =>
        s"CASE WHEN lag(cents, $j) OVER w IS NULL THEN 0 ELSE ${scale(j)} END"
      }.mkString(" + ")
      (num, den)
    }
    val (n1, d1) = sums(j => 1L << (DepthK - 1 - j))
    val (n2, d2) = sums(j => (j + 1L) * (1L << (DepthK - 1 - j)))
    s"""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT event_type, day, cents,
       |    CAST($n1 AS BIGINT) AS n1, CAST($d1 AS BIGINT) AS d1,
       |    CAST($n2 AS BIGINT) AS n2, CAST($d2 AS BIGINT) AS d2
       |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |s AS (SELECT *, CAST(n1 AS DOUBLE) / CAST(d1 AS DOUBLE) AS s1,
       |    CAST(n2 AS DOUBLE) / CAST(d2 AS DOUBLE) AS s2 FROM t)
       |SELECT event_type, day, cents,
       |  round((CAST(2 AS DOUBLE) * s1 - s2) / CAST(100 AS DOUBLE), 4) AS level,
       |  round((s1 - s2) / CAST(100 AS DOUBLE), 4) AS trend,
       |  round((CAST(2 AS DOUBLE) * s1 - s2 + CAST(7 AS DOUBLE) * (s1 - s2)) / CAST(100 AS DOUBLE), 4) AS forecast_7d
       |FROM s""".stripMargin
  }

  /** #329 STL-style decomposition (exact integer variant): the per-type
    * daily series splits into trend + dow-seasonal + residual, each an
    * EXACT ×7-cents integer so both engines agree bit-for-bit —
    * trend_c7 = centered 7-day sum (defined only where the full ±3-day
    * neighborhood exists, the classic centered-MA edge rule),
    * detrended = 7·y − trend_c7, seasonal_c7 = sign-safe per-dow mean of
    * the detrended values, resid_c7 = detrended − seasonal_c7. The
    * decomposition that turns "the series moved" into "trend moved vs a
    * normal Friday vs something actually happened" — the input
    * [[residualAnomaly]] fences and [[holtWinters]] assume.
    *
    * Scale: calendar self-joins on the (types×days)-bounded daily frame
    * (the acf pattern) — one corpus-scale aggregate, everything else is
    * calendar-sized.
    */
  def stlDecompose(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .localCheckpoint()
    val offs = spark.range(-3, 4).select(col("id").as("off"))
    val trend = daily.join(broadcast(offs))
      .select(col("event_type"), (col("day") + col("off")).as("day"), col("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("k"), sum(col("cents")).as("trend_c7"))
      .filter(col("k") === 7).drop("k")
    val det = daily.join(trend, Seq("event_type", "day"))
      .withColumn("detr_c7", expr("7 * cents - trend_c7"))
      .withColumn("dow", expr("(day + 4) % 7"))
      .localCheckpoint() // feeds the seasonal mean AND the final join
    val seasonal = det.groupBy("event_type", "dow")
      .agg(sum(col("detr_c7")).as("s"), count(lit(1)).as("n"))
      .withColumn("seasonal_c7", expr(
        "CASE WHEN s < 0 THEN -((-s) DIV n) ELSE s DIV n END"))
      .select("event_type", "dow", "seasonal_c7")
    det.join(seasonal, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("cents"), col("trend_c7"),
        col("seasonal_c7"), (col("detr_c7") - col("seasonal_c7")).as("resid_c7"))
  }

  def stlOracle: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT d.event_type, d.day + o.off AS day, count(*) AS k,
      |    sum(d.cents) AS trend_c7
      |  FROM daily d CROSS JOIN (SELECT CAST(unnest(range(-3, 4)) AS BIGINT) AS off) o
      |  GROUP BY 1, 2 HAVING count(*) = 7),
      |det AS (SELECT y.event_type, y.day, y.cents, t.trend_c7,
      |    7 * y.cents - t.trend_c7 AS detr_c7, (y.day + 4) % 7 AS dow
      |  FROM daily y JOIN t ON y.event_type = t.event_type AND y.day = t.day),
      |se AS (SELECT event_type, dow,
      |    CASE WHEN sum(detr_c7) < 0 THEN -((-sum(detr_c7)) // count(*))
      |      ELSE sum(detr_c7) // count(*) END AS seasonal_c7
      |  FROM det GROUP BY 1, 2)
      |SELECT det.event_type, day, cents, CAST(trend_c7 AS BIGINT) AS trend_c7,
      |  CAST(seasonal_c7 AS BIGINT) AS seasonal_c7,
      |  CAST(detr_c7 - seasonal_c7 AS BIGINT) AS resid_c7
      |FROM det JOIN se ON det.event_type = se.event_type AND det.dow = se.dow""".stripMargin

  /** #334 Seasonality / trend STRENGTH (Hyndman's STL-feature pair) from
    * the [[stlDecompose]] components, exact fixed-point:
    * F_seasonal = 1 − Var(R)/Var(S+R) (how much the dow pattern explains
    * of the detrended series), F_trend = 1 − Var(R)/Var(T+R) (ditto for
    * trend in the deseasonalized series), both as ×10⁴ integers clamped
    * at 0 via the (nΣx²−(Σx)²) DECIMAL variance cross-products — the
    * one-number answer to "is a seasonal forecaster even worth running
    * here" that feeds the [[backtest]] choice.
    */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val stl = stlDecompose(spark, dir)
      // D = detrended = S + R; A = deseasonalized = T + R (all ×7 cents)
      .select(col("event_type"), col("resid_c7").as("r"),
        (col("seasonal_c7") + col("resid_c7")).as("d"),
        (col("trend_c7") + col("resid_c7")).as("a"))
    stl.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("sum(CAST(r AS DECIMAL(38,0)))").as("sr"),
        expr("sum(CAST(r AS DECIMAL(38,0)) * r)").as("srr"),
        expr("sum(CAST(d AS DECIMAL(38,0)))").as("sd"),
        expr("sum(CAST(d AS DECIMAL(38,0)) * d)").as("sdd"),
        expr("sum(CAST(a AS DECIMAL(38,0)))").as("sa"),
        expr("sum(CAST(a AS DECIMAL(38,0)) * a)").as("saa"))
      .withColumn("vr", expr("CAST(n AS DECIMAL(38,0)) * srr - sr * sr"))
      .withColumn("vd", expr("CAST(n AS DECIMAL(38,0)) * sdd - sd * sd"))
      .withColumn("va", expr("CAST(n AS DECIMAL(38,0)) * saa - sa * sa"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("CASE WHEN vd <= 0 THEN NULL " +
          "ELSE CAST(greatest(10000 - vr * 10000 DIV vd, 0) AS BIGINT) END")
          .as("f_seasonal_e4"),
        expr("CASE WHEN va <= 0 THEN NULL " +
          "ELSE CAST(greatest(10000 - vr * 10000 DIV va, 0) AS BIGINT) END")
          .as("f_trend_e4"))
  }

  def seasonalStrengthOracle: String =
    s"""WITH stl AS ($stlOracle),
       |x AS (SELECT event_type, resid_c7 AS r,
       |    seasonal_c7 + resid_c7 AS d, trend_c7 + resid_c7 AS a FROM stl),
       |s AS (SELECT event_type, count(*) AS n,
       |    sum(CAST(r AS HUGEINT)) AS sr, sum(CAST(r AS HUGEINT) * r) AS srr,
       |    sum(CAST(d AS HUGEINT)) AS sd, sum(CAST(d AS HUGEINT) * d) AS sdd,
       |    sum(CAST(a AS HUGEINT)) AS sa, sum(CAST(a AS HUGEINT) * a) AS saa
       |  FROM x GROUP BY 1),
       |v AS (SELECT event_type, n,
       |    CAST(n AS HUGEINT) * srr - sr * sr AS vr,
       |    CAST(n AS HUGEINT) * sdd - sd * sd AS vd,
       |    CAST(n AS HUGEINT) * saa - sa * sa AS va FROM s)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days,
       |  CASE WHEN vd <= 0 THEN NULL
       |    ELSE CAST(greatest(10000 - vr * 10000 // vd, 0) AS BIGINT) END AS f_seasonal_e4,
       |  CASE WHEN va <= 0 THEN NULL
       |    ELSE CAST(greatest(10000 - vr * 10000 // va, 0) AS BIGINT) END AS f_trend_e4
       |FROM v""".stripMargin

  /** #327 Additive Holt-Winters (α=1/2, β=1/4, γ=1/4, season = day-of-
    * week) over the per-type daily series — the SEASONAL member of the
    * forecasting suite ([[brownForecast]] is the non-seasonal one,
    * [[backtest]] picks between them). Warm-up: level = first-week mean,
    * trend = 0, seasonals = first-week deviations (dow-indexed, missing
    * dows seed 0); then the standard recursion over the OBSERVED day
    * sequence with calendar-dow seasonal indexing (documented choice for
    * gapped series). Forecast h days out = level + h·trend +
    * seasonal(dow(last_day + h)).
    *
    * The recursion is inherently sequential per series, so the state fold
    * runs DRIVER-SIDE over the collected CALENDAR-BOUNDED daily frame
    * (types × days — the [[graft.operators.Events.markovAttribution]]
    * boundedness argument; the corpus-scale work is the one shared daily
    * aggregate). Hash-oracle checked (r5): the oracle replays the fold as
    * a recursive CTE carrying (level, trend, seasonal[7]) — same day
    * order, same IEEE operation sequence — and the spec pins
    * flat/ramp/weekly planted series besides.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val alpha = 0.5; val beta = 0.25; val gamma = 0.25
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect() // calendar-bounded: types × days, never event-scale
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def dow(day: Long): Int = ((day + 4) % 7).toInt
    val rows = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (tpe, rs) =>
      val series = rs.sortBy(_._2).map { case (_, d, c) => (d, c / 100.0) }
      val warm = series.take(7)
      var l = warm.map(_._2).sum / warm.length
      var b = 0.0
      val s = Array.fill(7)(0.0)
      warm.foreach { case (d, y) => s(dow(d)) = y - l }
      series.drop(7).foreach { case (d, y) =>
        val si = dow(d)
        val lPrev = l
        l = alpha * (y - s(si)) + (1 - alpha) * (l + b)
        b = beta * (l - lPrev) + (1 - beta) * b
        s(si) = gamma * (y - l) + (1 - gamma) * s(si)
      }
      val lastDay = series.last._1
      def fc(h: Int): Double =
        math.rint((l + h * b + s(dow(lastDay + h))) * 10000) / 10000
      (tpe, series.length.toLong, lastDay,
        math.rint(l * 10000) / 10000, math.rint(b * 10000) / 10000,
        fc(1), fc(7))
    }
    import spark.implicits._
    rows.toDF("event_type", "n_days", "last_day", "level", "trend",
      "fc_1d", "fc_7d")
  }

  /** #317 Rolling-origin forecast backtest: the model-selection readout
    * that tells you WHICH forecaster ([[brownForecast]], seasonal
    * adjustment, or nothing at all) has earned its keep on this series.
    * Three reference forecasters are scored out-of-sample on the per-type
    * daily cents series:
    *   - `naive`   : ŷ(d) = y(d−1)
    *   - `snaive`  : ŷ(d) = y(d−7)   (the day-of-week baseline)
    *   - `ma7`     : ŷ(d) = mean(y(d−7..d−1)), scored only on days whose
    *                 full 7-day history exists (no partial means)
    * Metrics are EXACT integers on both engines: MAE as ×100 cents
    * (`Σ|y−ŷ|·100 DIV n`, with ma7 kept in 7ths: `Σ|7y−Σ₇|·100 DIV 7n`)
    * and sMAPE as a ×10⁴ ratio where the per-day division is integer DIV
    * with non-negative numerators (floor == truncate, engine-agnostic).
    *
    * Scale: pairing is calendar self-join on the (types × days)-bounded
    * daily frame — the acf/trend pattern — so the only corpus-scale work
    * is the shared daily aggregate (localCheckpointed, scanned once).
    */
  def backtest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .localCheckpoint()
    val y = daily.select(col("event_type"), col("day"), col("cents").as("y"))
    def lagPairs(l: Int, name: String): DataFrame =
      daily.select(col("event_type"), (col("day") + l).as("day"),
          col("cents").as("f"))
        .join(y, Seq("event_type", "day"))
        .select(col("event_type"), lit(name).as("method"),
          abs(col("y") - col("f")).as("ae"),
          expr("CASE WHEN abs(y) + abs(f) = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE 2 * abs(y - f) * 10000 DIV (abs(y) + abs(f)) END").as("sm"),
          lit(1L).as("den"))
    val offsets = spark.range(1, 8).select(col("id").as("off"))
    val ma7 = daily.join(broadcast(offsets))
      .select(col("event_type"), (col("day") + col("off")).as("day"), col("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("k"), sum(col("cents")).as("f7"))
      .filter(col("k") === 7)
      .join(y, Seq("event_type", "day"))
      .select(col("event_type"), lit("ma7").as("method"),
        abs(expr("7 * y - f7")).as("ae"),
        expr("CASE WHEN 7 * abs(y) + abs(f7) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE 2 * abs(7 * y - f7) * 10000 DIV (7 * abs(y) + abs(f7)) END").as("sm"),
        lit(7L).as("den"))
    lagPairs(1, "naive").unionByName(lagPairs(7, "snaive")).unionByName(ma7)
      .groupBy("event_type", "method")
      .agg(count(lit(1)).as("n_days"),
        expr("CAST(sum(ae) * 100 DIV sum(den) AS BIGINT)").as("mae_e2"),
        expr("CAST(sum(sm) DIV count(1) AS BIGINT)").as("smape_e4"))
  }

  /** #378 `ts_theil_sen` — Theil-Sen robust trend per event type over
    * the daily-count series: the median of all pairwise slopes
    * (y_j−y_i)/(x_j−x_i), the estimator that shrugs off the outlier days
    * OLS ([[trend]]) gets dragged by (up to ~29% contamination). The
    * median is selected EXACTLY: slopes order by their double value
    * (identical IEEE division both engines) with full integer tiebreaks
    * (num, den, d1, d2 — a total order), and the lower median's own
    * integer numerator/denominator are reported, so the output is pure
    * integers — no float ever lands in the frame.
    *
    * Scale: the pairwise frame is D²/2 per type for D = DAYS OBSERVED —
    * calendar-bounded (a year of data is ~66k pairs/type), never
    * data-sized; the slope rank runs per-type on that bounded frame. The
    * daily aggregate is the only data-sized pass.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("n").as("n1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("n").as("n2"))
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("d2") > col("d1"))
      .select(col("event_type"),
        (col("n2") - col("n1")).as("num"),
        (col("d2") - col("d1")).as("den"),
        col("d1"), col("d2"))
      .withColumn("slope", col("num").cast("double") / col("den").cast("double"))
    val wRank = Window.partitionBy("event_type")
      .orderBy(col("slope").asc, col("num").asc, col("den").asc,
        col("d1").asc, col("d2").asc)
    pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .selectExpr("event_type", "cnt AS n_pairs",
        "num AS slope_num", "den AS slope_den", "d1 AS x1", "d2 AS x2",
        "CAST(CASE WHEN num < 0 THEN -((-num) * 10000 DIV den) " +
          "ELSE num * 10000 DIV den END AS BIGINT) AS slope_e4")
  }

  /** #400 `ts_gap_audit` — feed-health gap census, the READOUT behind
    * [[gapFill]]'s repair: per type, calendar span vs days observed,
    * missing-day count and ppm, and the longest dark stretch (max
    * day-over-day jump on the observed sequence, minus one) — the number
    * that distinguishes "weekends are quiet" from "the connector was
    * down for a week". One daily aggregate; the audit runs on the
    * day-sized frame with a per-type lag.
    */
  def gapAudit(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"))
      .distinct()
    val wd = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("gap", col("day") - lag(col("day"), 1).over(wd) - 1L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("days_observed"),
        (max(col("day")) - min(col("day")) + 1L).as("span_days"),
        coalesce(max(col("gap")), lit(0L)).as("longest_gap_days"))
      .selectExpr("event_type", "days_observed", "span_days",
        "span_days - days_observed AS missing_days",
        "(span_days - days_observed) * 1000000 DIV span_days AS missing_ppm",
        "longest_gap_days")
  }

  /** #390 `ts_forecast_pi` — empirical prediction intervals for the naive
    * forecast ([[backtest]]'s baseline): per type, the day-over-day
    * residual distribution's exact-rank P10/P90 band (ceil-rank
    * convention shared with `ev_watermark_advice`, ranks from
    * [[Distributed.exactRank]] — no single-reducer percentile sort) and
    * the band's own empirical coverage (≈80% by construction, exact ×10⁴
    * — the self-audit that the band math is right). Residuals are over
    * OBSERVED days (a gap day contributes one long-horizon residual, not
    * a fabricated zero). Everything integer cents until the final ppm
    * divisions.
    */
  def forecastPi(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val wd = Window.partitionBy("event_type").orderBy("day")
    val resid = daily
      .withColumn("prev", lag(col("cents"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("day"),
        (col("cents") - col("prev")).as("r"))
    val ranked = Distributed.exactRank(resid, Seq("event_type"), Seq("r", "day"))
    val bands = ranked.groupBy("event_type")
      .agg(max(col("n_total")).as("n_resid"),
        min(when(col("rnk") === expr("(10 * n_total + 99) DIV 100"), col("r")))
          .as("p10_c"),
        min(when(col("rnk") === expr("(90 * n_total + 99) DIV 100"), col("r")))
          .as("p90_c"))
    ranked.join(broadcast(bands), "event_type")
      .groupBy("event_type")
      .agg(max(col("n_resid")).as("n_resid"),
        max(col("p10_c")).as("p10_resid_c"),
        max(col("p90_c")).as("p90_resid_c"),
        sum(when(col("r") >= col("p10_c") && col("r") <= col("p90_c"), 1L)
          .otherwise(0L)).as("n_in_band"))
      .selectExpr("event_type", "n_resid", "p10_resid_c", "p90_resid_c",
        "n_in_band", "n_in_band * 10000 DIV n_resid AS coverage_e4")
  }

  /** #394 `ts_dow_adjust` — day-of-week seasonal adjustment of the daily
    * series: each (type, day)'s cents rescaled by its dow's inverse
    * seasonal index, adj = cents · (t_all·days_dow) / (days_all·t_dow),
    * in ONE exact cross-multiplied ×10⁴ integer (no per-dow division
    * first, so truncation can't compound) — the series a trend/anomaly
    * pass should consume when weekends are structurally quiet
    * ([[seasonality]] measures the index; this applies it). Day-sized
    * frames after the one daily aggregate; dow index joins broadcast.
    */
  def dowAdjust(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val byDow = daily
      .groupBy(col("event_type"), expr("(day + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("days_dow"), sum(col("cents")).as("t_dow"))
    val overall = byDow.groupBy("event_type")
      .agg(sum(col("days_dow")).as("days_all"), sum(col("t_dow")).as("t_all"))
    daily
      .withColumn("dow", expr("(day + 4) % 7"))
      .join(broadcast(byDow), Seq("event_type", "dow"))
      .join(broadcast(overall), Seq("event_type"))
      .selectExpr("event_type", "day", "dow", "cents",
        "CASE WHEN t_dow = 0 THEN NULL ELSE " +
          "CAST(CAST(cents AS DECIMAL(38,0)) * t_all * days_dow * 10000 " +
          "DIV (CAST(days_all AS DECIMAL(38,0)) * t_dow) AS BIGINT) END " +
          "AS adj_cents_e4")
  }

  /** #413 `ts_changepoint` — OFFLINE multiple-changepoint detection via
    * two-level binary segmentation (Scott & Knott '74 lineage; the
    * standard first cut at "where did the level shift"): [[cusum]] is the
    * ONLINE alarm that needs a reference level; this is the retrospective
    * answer — given the whole series, the split that most reduces
    * within-segment variance, then the best split INSIDE each half.
    *
    * Exactness contract: the between-segment sum of squares is evaluated
    * through the shift-invariant single-fraction identity (see
    * [[changepointsFromDaily]]'s relExpr) as ONE integer division whose
    * quotient is an R²-style ×10⁶ share in [0, 10⁶] (squares are
    * DECIMAL(38,0) / HUGEINT; numerator a square, divisor positive, so
    * Spark's truncating DIV and DuckDB's flooring `//` agree); argmax
    * ties break to the smallest position — bit-identical cross-engine.
    * Segment SUMS and LENGTHS are reported instead of means so no signed
    * division ever happens.
    *
    * Scale shape: ONE event aggregation to the calendar-bounded daily
    * frame; every window after that is day×type-sized. The candidate
    * gain is computed per ROW off the running prefix sum (no self-join —
    * gain(s) needs only P(s), s and the per-type totals), and level 2
    * reuses the SAME global prefix via segment-relative algebra after a
    * broadcast of the per-type level-1 winner.
    */
  def changepoints(spark: SparkSession, dir: String, minSeg: Int = 2): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"(ts DIV 1000) DIV $DayUs").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    changepointsFromDaily(daily, minSeg)
  }

  private[graft] def changepointsFromDaily(daily0: DataFrame,
      minSeg: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val wd = Window.partitionBy("event_type").orderBy("day")
    val wp = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = daily0
      .withColumn("pos", row_number().over(wd))
      .withColumn("p", sum(col("cents")).over(wp))
      .withColumn("q",
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).over(wp))
      .localCheckpoint()
    val tot = daily.groupBy("event_type")
      .agg(max(col("pos")).as("n"), sum(col("cents")).cast("long").as("t"),
        max(col("q")).as("sq"))
    // Between-segment sum of squares for a split of segment (sum=ss,
    // len=sl) at relative position u with relative prefix pu, via the
    // shift-invariant single-fraction identity
    //   between = D^2 / (u*(sl-u)*sl),  D = u*ss - sl*pu = u*(sl-u)*(muR-muL),
    // reported RELATIVE to the segment's total sum of squares sqSeg
    // (Sum x^2, >= the centered SS >= between), x10^6. ONE DIV whose
    // quotient is mathematically in [0, 10^6] — Spark's DIV returns
    // BIGINT, so the naive per-term Sum^2/n form overflows at cents^2
    // scale. This form's numerator D^2 * 10^6 is DECIMAL(38,0), so it is
    // exact while |D| = |u*ss - sl*pu| <= ~1.26e16 (sqrt(10^38/10^6));
    // D is a day-count times a cents sum, so the bound holds up to
    // ~1.26e16/n cents of |segment mass| at n days — e.g. >3e13 cents
    // ($300B) of daily skew on a year series. Beyond that Spark's decimal
    // overflows to NULL while DuckDB's HUGEINT keeps computing — a
    // documented engine-parity bound, not an impossibility. The numerator
    // is a square (>= 0), the
    // divisor positive: truncation == floor, so Spark DIV and DuckDB //
    // agree bit-for-bit, and the per-type argmax of the quantized ratio
    // (ties to the smallest position) is deterministic cross-engine.
    def relExpr(u: String, pu: String, ss: String, sl: String, sqSeg: String) =
      s"CASE WHEN ($sqSeg) = 0 THEN CAST(0 AS BIGINT) ELSE CAST(" +
        s"(CAST(($u) AS DECIMAL(38,0)) * ($ss) - CAST(($sl) AS DECIMAL(38,0)) * ($pu)) * " +
        s"(CAST(($u) AS DECIMAL(38,0)) * ($ss) - CAST(($sl) AS DECIMAL(38,0)) * ($pu)) * 1000000 DIV " +
        s"(CAST(($u) AS DECIMAL(38,0)) * (($sl) - ($u)) * ($sl) * ($sqSeg)) AS BIGINT) END"
    val wG = Window.partitionBy("event_type").orderBy(col("gain").desc, col("pos"))
    val cp1 = daily.join(broadcast(tot), "event_type")
      .filter(col("pos") >= minSeg && col("pos") <= col("n") - minSeg)
      .withColumn("gain", expr(relExpr("pos", "p", "t", "n", "sq")))
      .withColumn("r", row_number().over(wG)).filter(col("r") === 1)
      .select(col("event_type"), lit(1L).as("level"), lit("all").as("segment"),
        col("pos").cast("long").as("cp_pos"), col("day").as("cp_day"),
        col("gain").as("gain_rel_q6"),
        col("p").as("sum_left_c"), col("pos").cast("long").as("len_left"),
        (col("t") - col("p")).as("sum_right_c"),
        (col("n") - col("pos")).cast("long").as("len_right"),
        col("q").as("qs"))
    // level 2: re-split each side of the level-1 winner, segment-relative
    val s1 = cp1.select(col("event_type"), col("cp_pos").as("s"),
      col("sum_left_c").as("ps"), col("qs"))
    val withCp = daily.join(broadcast(tot), "event_type")
      .join(broadcast(s1), "event_type")
    val left = withCp
      .filter(col("pos") >= minSeg && col("pos") <= col("s") - minSeg)
      .withColumn("segment", lit("left"))
      .withColumn("u", col("pos")).withColumn("pu", col("p"))
      .withColumn("seg_sum", col("ps")).withColumn("seg_len", col("s"))
      .withColumn("seg_sq", col("qs"))
    val right = withCp
      .filter(col("pos") >= col("s") + minSeg && col("pos") <= col("n") - minSeg)
      .withColumn("segment", lit("right"))
      .withColumn("u", col("pos") - col("s")).withColumn("pu", col("p") - col("ps"))
      .withColumn("seg_sum", col("t") - col("ps"))
      .withColumn("seg_len", col("n") - col("s"))
      .withColumn("seg_sq", col("sq") - col("qs"))
    val wG2 = Window.partitionBy("event_type", "segment")
      .orderBy(col("gain").desc, col("pos"))
    val cp2 = left.unionByName(right)
      .withColumn("gain", expr(relExpr("u", "pu", "seg_sum", "seg_len", "seg_sq")))
      .withColumn("r", row_number().over(wG2)).filter(col("r") === 1)
      .select(col("event_type"), lit(2L).as("level"), col("segment"),
        col("pos").cast("long").as("cp_pos"), col("day").as("cp_day"),
        col("gain").as("gain_rel_q6"),
        col("pu").as("sum_left_c"), col("u").cast("long").as("len_left"),
        (col("seg_sum") - col("pu")).as("sum_right_c"),
        (col("seg_len") - col("u")).cast("long").as("len_right"))
    cp1.drop("qs").unionByName(cp2)
  }

  /** DuckDB oracle for [[changepoints]] — identical prefix-sum windows,
    * HUGEINT squares, `//` floor division (every operand nonnegative so
    * it matches Spark's truncating DIV), same (gain DESC, pos) tie-break.
    */
  def changepointsOracle(minSeg: Int = 2): String =
    s"""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |d AS (SELECT event_type, day, cents,
       |    row_number() OVER w AS pos, sum(cents) OVER w AS p,
       |    sum(CAST(cents AS HUGEINT) * cents) OVER w AS q
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |tot AS (SELECT event_type, max(pos) AS n, sum(cents) AS t, max(q) AS sq
       |  FROM d GROUP BY 1),
       |c1 AS (SELECT d.event_type, day, pos, p, q, n, t, sq,
       |    CASE WHEN sq = 0 THEN 0 ELSE
       |      (CAST(pos AS HUGEINT) * t - CAST(n AS HUGEINT) * p) *
       |      (CAST(pos AS HUGEINT) * t - CAST(n AS HUGEINT) * p) * 1000000 //
       |      (CAST(pos AS HUGEINT) * (n - pos) * n * sq) END AS gain
       |  FROM d JOIN tot USING (event_type)
       |  WHERE pos >= $minSeg AND pos <= n - $minSeg),
       |cp1 AS (SELECT * FROM (SELECT c1.*,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY gain DESC, pos) AS r FROM c1) WHERE r = 1),
       |c2 AS (SELECT d.event_type, d.day, d.pos,
       |    CASE WHEN d.pos <= cp1.pos THEN 'left' ELSE 'right' END AS segment,
       |    CASE WHEN d.pos <= cp1.pos THEN d.pos ELSE d.pos - cp1.pos END AS u,
       |    CASE WHEN d.pos <= cp1.pos THEN d.p ELSE d.p - cp1.p END AS pu,
       |    CASE WHEN d.pos <= cp1.pos THEN cp1.p ELSE t.t - cp1.p END AS seg_sum,
       |    CASE WHEN d.pos <= cp1.pos THEN cp1.pos ELSE t.n - cp1.pos END AS seg_len,
       |    CASE WHEN d.pos <= cp1.pos THEN cp1.q ELSE t.sq - cp1.q END AS seg_sq
       |  FROM d JOIN cp1 USING (event_type) JOIN tot t USING (event_type)
       |  WHERE (d.pos >= $minSeg AND d.pos <= cp1.pos - $minSeg)
       |     OR (d.pos >= cp1.pos + $minSeg AND d.pos <= t.n - $minSeg)),
       |g2 AS (SELECT event_type, day, pos, segment, u, pu, seg_sum, seg_len,
       |    CASE WHEN seg_sq = 0 THEN 0 ELSE
       |      (CAST(u AS HUGEINT) * seg_sum - CAST(seg_len AS HUGEINT) * pu) *
       |      (CAST(u AS HUGEINT) * seg_sum - CAST(seg_len AS HUGEINT) * pu) * 1000000 //
       |      (CAST(u AS HUGEINT) * (seg_len - u) * seg_len * seg_sq) END AS gain
       |  FROM c2),
       |cp2 AS (SELECT * FROM (SELECT g2.*,
       |    row_number() OVER (PARTITION BY event_type, segment
       |      ORDER BY gain DESC, pos) AS r FROM g2) WHERE r = 1)
       |SELECT event_type, CAST(1 AS BIGINT) AS level, 'all' AS segment,
       |  pos AS cp_pos, day AS cp_day, CAST(gain AS BIGINT) AS gain_rel_q6,
       |  CAST(p AS BIGINT) AS sum_left_c, CAST(pos AS BIGINT) AS len_left,
       |  CAST(t - p AS BIGINT) AS sum_right_c, CAST(n - pos AS BIGINT) AS len_right
       |FROM cp1
       |UNION ALL
       |SELECT event_type, CAST(2 AS BIGINT), segment, pos, day,
       |  CAST(gain AS BIGINT),
       |  CAST(pu AS BIGINT), CAST(u AS BIGINT),
       |  CAST(seg_sum - pu AS BIGINT), CAST(seg_len - u AS BIGINT)
       |FROM cp2""".stripMargin

  def backtestOracle: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |n1 AS (SELECT y.event_type, 'naive' AS method, abs(y.cents - f.cents) AS ae,
      |    CASE WHEN abs(y.cents) + abs(f.cents) = 0 THEN 0
      |      ELSE 2 * abs(y.cents - f.cents) * 10000 // (abs(y.cents) + abs(f.cents)) END AS sm,
      |    1 AS den
      |  FROM daily y JOIN daily f ON y.event_type = f.event_type AND y.day = f.day + 1),
      |n7 AS (SELECT y.event_type, 'snaive' AS method, abs(y.cents - f.cents) AS ae,
      |    CASE WHEN abs(y.cents) + abs(f.cents) = 0 THEN 0
      |      ELSE 2 * abs(y.cents - f.cents) * 10000 // (abs(y.cents) + abs(f.cents)) END AS sm,
      |    1 AS den
      |  FROM daily y JOIN daily f ON y.event_type = f.event_type AND y.day = f.day + 7),
      |m AS (SELECT d.event_type, d.day + o.off AS day, count(*) AS k, sum(d.cents) AS f7
      |  FROM daily d CROSS JOIN (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS off) o
      |  GROUP BY 1, 2 HAVING count(*) = 7),
      |m7 AS (SELECT y.event_type, 'ma7' AS method, abs(7 * y.cents - m.f7) AS ae,
      |    CASE WHEN 7 * abs(y.cents) + abs(m.f7) = 0 THEN 0
      |      ELSE 2 * abs(7 * y.cents - m.f7) * 10000 // (7 * abs(y.cents) + abs(m.f7)) END AS sm,
      |    7 AS den
      |  FROM daily y JOIN m ON y.event_type = m.event_type AND y.day = m.day),
      |u AS (SELECT * FROM n1 UNION ALL SELECT * FROM n7 UNION ALL SELECT * FROM m7)
      |SELECT event_type, method, count(*) AS n_days,
      |  CAST(sum(ae) * 100 // sum(den) AS BIGINT) AS mae_e2,
      |  CAST(sum(sm) // count(*) AS BIGINT) AS smape_e4
      |FROM u GROUP BY 1, 2""".stripMargin
}
