package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Profile, TimeSeries}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("changepoints: planted two-level shift is recovered exactly at both levels") {
    // type A: 8 days at 100c, then 8 at 1000c, with the RIGHT half itself
    // shifting to 2000c after 4 days — level 1 must split at the big jump
    // (pos 8), level 2 right must split at pos 12; level 2 left has no
    // structure (gain 0 on a constant segment).
    val rows =
      (1 to 8).map(d => ("A", d.toLong, 100L)) ++
      (9 to 12).map(d => ("A", d.toLong, 1000L)) ++
      (13 to 16).map(d => ("A", d.toLong, 2000L))
    val daily = rows.toDF("event_type", "day", "cents")
    val got = TimeSeries.changepointsFromDaily(daily, minSeg = 2)
      .collect().map(r => (r.getAs[Long]("level"), r.getAs[String]("segment")) ->
        ((r.getAs[Long]("cp_pos"), r.getAs[Long]("cp_day"),
          r.getAs[Long]("sum_left_c"), r.getAs[Long]("len_left"),
          r.getAs[Long]("sum_right_c"), r.getAs[Long]("len_right"),
          r.getAs[Long]("gain_rel_q6")))).toMap
    assert(got((1L, "all"))._1 == 8L, s"level-1 split not at the big jump: $got")
    assert(got((1L, "all"))._2 == 8L) // cp_day = last day of the left piece
    assert(got((1L, "all"))._3 == 800L && got((1L, "all"))._4 == 8L)
    assert(got((1L, "all"))._5 == 12000L && got((1L, "all"))._6 == 8L)
    assert(got((2L, "right"))._1 == 12L, s"level-2 right split missed: $got")
    assert(got((2L, "left"))._7 == 0L, "constant left segment must have zero gain")
    // both real splits carry positive relative gain
    assert(got((1L, "all"))._7 > 0L && got((2L, "right"))._7 > 0L)
  }

  test("changepoints: split positions are shift-invariant (the D identity in practice)") {
    // between-segment SS depends only on mean DIFFERENCES, so adding a
    // constant to every day must not move any split (the normalizer sq
    // changes, but the per-type argmax ranks by a constant-denominator
    // ratio). Planted well-separated shifts so 1e-6 quantization ties
    // cannot flip the winner.
    val rows =
      (1 to 8).map(d => ("A", d.toLong, 100L)) ++
      (9 to 12).map(d => ("A", d.toLong, 1000L)) ++
      (13 to 16).map(d => ("A", d.toLong, 2000L))
    def posOf(shift: Long) = TimeSeries.changepointsFromDaily(
        rows.map { case (t, d, c) => (t, d, c + shift) }
          .toDF("event_type", "day", "cents"), minSeg = 2)
      .collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[String]("segment")) ->
        r.getAs[Long]("cp_pos")).toMap
    val base = posOf(0L)
    assert(posOf(5000L) === base, "positive shift moved a changepoint")
    assert(posOf(-300L) === base, "negative shift moved a changepoint")
  }

  test("changepoints: short series emit nothing, ties break to the smallest position") {
    // 3 days < 2*minSeg: no admissible split at all
    val tiny = Seq(("T", 1L, 5L), ("T", 2L, 5L), ("T", 3L, 5L))
      .toDF("event_type", "day", "cents")
    assert(TimeSeries.changepointsFromDaily(tiny, minSeg = 2).count() == 0)
    // perfectly symmetric step: pos 2..4 all tie on a constant series —
    // the winner must be the smallest admissible position
    val const = (1 to 6).map(d => ("C", d.toLong, 7L)).toDF("event_type", "day", "cents")
    val l1 = TimeSeries.changepointsFromDaily(const, minSeg = 2)
      .filter(col("level") === 1).collect()
    assert(l1.length == 1 && l1.head.getAs[Long]("cp_pos") == 2L,
      s"tie did not break to the smallest position: ${l1.mkString}")
  }

  test("gapFill emits one contiguous day per user and conserves real days") {
    val daily = Tables.events(spark, sf)
      .select(col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .distinct()
    val filled = TimeSeries.gapFill(spark, sf).cache()
    // spine = exactly (d1 - d0 + 1) rows per user, all days distinct
    val spans = filled.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("day")).as("nd"),
        (max(col("day")) - min(col("day")) + 1).as("span"))
      .collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Long]("span"), s"holes for user ${r.get(0)}")
      assert(r.getAs[Long]("n") === r.getAs[Long]("nd"))
    }
    // non-gap day set == the real active-day set
    val realDays = daily.count()
    assert(filled.filter(col("is_gap") === 0).count() === realDays)
    // every row carries a filled value (spine starts on an active day)
    assert(filled.filter(col("value_filled").isNull).count() === 0)
    filled.unpersist()
  }

  test("theil-sen: planted exponential series yields the hand-computed median slope") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L // one day in the ns ts unit
    // daily counts 1,2,4,8 on days 0..3 -> pairwise slopes
    // {1, 1.5, 2, 7/3, 3, 4}; lower median (rank 3 of 6) = 2 = (4-2)/(2-1)
    var id = 0L
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 4, 3 -> 8).flatMap { case (d, n) =>
      (1 to n).map { _ => id += 1; (id, d * dayNs + id, 1L, "click", 0.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("theil").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = TimeSeries.theilSen(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_pairs") === 6L, r.head.toString)
    assert(r.head.getAs[Long]("slope_num") === 2L, r.head.toString)
    assert(r.head.getAs[Long]("slope_den") === 1L, r.head.toString)
    assert(r.head.getAs[Long]("x1") === 1L && r.head.getAs[Long]("x2") === 2L)
    assert(r.head.getAs[Long]("slope_e4") === 20000L)
  }

  test("forecast PI: planted 1..10 residual ladder yields exact rank band and coverage") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // cents walk: +1, +2, ..., +10 over 11 days -> residuals {1..10}
    var cents = 100L; var id = 0L
    val rows = (0 to 10).flatMap { d =>
      if (d > 0) cents += d
      id += 1
      Seq((id, d * dayNs, 1L, "click", cents / 100.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("fpi").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = TimeSeries.forecastPi(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_resid") === 10L)
    assert(r.head.getAs[Long]("p10_resid_c") === 1L, r.head.toString)
    assert(r.head.getAs[Long]("p90_resid_c") === 9L, r.head.toString)
    assert(r.head.getAs[Long]("n_in_band") === 9L)
    assert(r.head.getAs[Long]("coverage_e4") === 9000L)
  }

  test("dow adjust: an exact weekly pattern flattens to one constant adjusted level") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    var id = 0L
    // 14 days (every dow exactly twice): weekends 50c, weekdays 100c
    val rows = (0 to 13).map { d =>
      val dow = (d + 4) % 7
      val v = if (dow == 0 || dow == 6) 0.50 else 1.00
      id += 1; (id, d * dayNs, 1L, "click", v, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("dowadj").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = TimeSeries.dowAdjust(spark, dir).collect()
    assert(out.length === 14)
    // t_all=1200, days_all=14: every day adjusts to 1200*2*10^4*c/(14*t_dow)
    // = 857142 for both weekday (100c/200) and weekend (50c/100) days
    out.foreach(r =>
      assert(r.getAs[Long]("adj_cents_e4") === 857142L, r.toString))
  }

  test("theil-sen on the corpus: selected slope is a true median of the pairwise set") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("n").as("n1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("n").as("n2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d2") > col("d1"))
      .select(col("event_type"),
        (col("n2") - col("n1")).cast("double")./((col("d2") - col("d1")).cast("double"))
          .as("slope"))
    val out = TimeSeries.theilSen(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val sel = r.getAs[Long]("slope_num").toDouble / r.getAs[Long]("slope_den")
      val cnt = r.getAs[Long]("n_pairs")
      val below = pairs.filter(col("event_type") === et && col("slope") < sel).count()
      val above = pairs.filter(col("event_type") === et && col("slope") > sel).count()
      // lower median: strictly-below < half the set, strictly-above <= half
      assert(below <= (cnt - 1) / 2, s"$et below=$below cnt=$cnt")
      assert(above <= cnt / 2, s"$et above=$above cnt=$cnt")
    }
  }

  test("gapFill carries the last seen value across a gap") {
    val filled = TimeSeries.gapFill(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val bad = filled
      .withColumn("prev", lag(col("value_filled"), 1).over(w))
      .filter(col("is_gap") === 1 && !(col("value_filled") <=> col("prev")))
      .count()
    assert(bad === 0, s"$bad gap rows broke the carry-forward")
  }

  test("ewma equals the raw value on each user's first event and stays in the trailing range") {
    val e = TimeSeries.ewma(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), round(round(col("value") * 100) / 100.0, 4).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val firsts = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val wrongFirst = firsts.join(ev, "event_id")
      .filter(abs(col("ewma") - col("v")) > 1e-9).count()
    assert(wrongFirst === 0, "first-event EWMA must equal the event value")
    // EWMA is a convex combination of trailing values -> bounded by the
    // trailing-window extrema (16 rows, matching DepthK)
    val frame = w.rowsBetween(-(TimeSeries.DepthK - 1), 0)
    val cents = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"),
        (round(col("value") * 100) / 100.0).as("v"))
    val bounds = cents
      .withColumn("lo", min(col("v")).over(frame))
      .withColumn("hi", max(col("v")).over(frame))
    val outOfRange = e.join(bounds.select("event_id", "lo", "hi"), "event_id")
      .filter(col("ewma") < col("lo") - 1e-4 || col("ewma") > col("hi") + 1e-4)
      .count()
    assert(outOfRange === 0, "EWMA left the trailing-value envelope")
  }

  test("ewma plans as ONE window over one exchange (16 lags share the sort)") {
    val plan = TimeSeries.ewma(spark, sf).queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(plan).size
    assert(plan.contains("Window"), plan.take(400))
    assert(windows <= 1, s"expected a single WindowExec, got $windows:\n$plan")
  }

  test("joinCardinality predicts the exact join size and hot key") {
    val l = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (5, "e")).toDF("k", "lv")
    val r = Seq((1, "x"), (2, "y"), (2, "z"), (4, "w")).toDF("k", "rv")
    val p = Profile.joinCardinalityOn(l, "k", r, "k").head()
    assert(p.getAs[Long]("n_left") === 5L)
    assert(p.getAs[Long]("n_right") === 4L)
    assert(p.getAs[Long]("distinct_left_keys") === 4L)
    assert(p.getAs[Long]("distinct_right_keys") === 3L)
    assert(p.getAs[Long]("n_matching_keys") === 2L)
    val actual = l.join(r, "k").count()
    assert(p.getAs[Long]("predicted_rows") === actual)
    assert(p.getAs[Long]("max_key_rows") === 2L) // key 1: 2·1, key 2: 1·2
  }

  test("pagerank concentrates on a planted hub and conserves total mass") {
    // bidirectional star: every spoke <-> node 0
    val edges = ((1L to 20L).flatMap(i => Seq((i, 0L), (0L, i)))).toDF("src", "dst")
    val pr = Graph.pagerankFrom(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size === 21)
    val top = pr.maxBy(_._2)._1
    assert(top === 0L, s"hub should dominate, got $pr")
    // ranks sum to n (damping model conserves total mass)
    val total = pr.values.sum
    assert(math.abs(total - 21.0) < 0.05, s"mass drifted: $total")
    // spokes are symmetric -> identical ranks
    val spokeRanks = (2L to 20L).map(pr)
    assert(spokeRanks.distinct.size === 1, "symmetric spokes must tie")
  }

  test("trend slope agrees with the FP regression and r2 stays in [0,1]") {
    val t = TimeSeries.trend(spark, sf).collect()
    assert(t.nonEmpty)
    // recompute per type with plain double OLS; exact result must sit
    // within one e6 quantum + FP noise of it
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("y"))
      .collect().groupBy(_.getString(0))
    t.foreach { r =>
      val pts = daily(r.getString(0)).map(x => (x.getLong(1).toDouble, x.getLong(2).toDouble))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getAs[Long]("n_days") === pts.length.toLong)
      assert(math.abs(r.getAs[Long]("slope_e6") - slope * 1e6) <= 2.0,
        s"${r.getString(0)}: exact ${r.getAs[Long]("slope_e6")} vs fp ${slope * 1e6}")
      val r2 = r.getAs[Long]("r2_e4")
      assert(r2 >= 0L && r2 <= 10000L)
    }
  }

  test("seasonality masses tile the overall totals and ratios center on 1e4") {
    val sSpark = TimeSeries.seasonality(spark, sf).cache()
    val tiles = sSpark.groupBy("event_type")
      .agg(sum(col("days_dow")).as("dsum"), sum(col("t_dow")).as("tsum"))
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("days_all"), sum(col("c")).as("t_all"))
    val bad = tiles.join(daily, "event_type")
      .filter(col("dsum") =!= col("days_all") || col("tsum") =!= col("t_all"))
      .count()
    assert(bad === 0)
    // the days_dow-weighted mean of mean-ratios is 1 by construction:
    // Σ_dow days_dow·(t_dow·days_all)/(days_dow·t_all) = days_all
    val rows = sSpark.collect()
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val daysAll = rs.map(_.getAs[Long]("days_dow")).sum.toDouble
      val weighted = rs.map(r =>
        r.getAs[Long]("days_dow") * r.getAs[Long]("ratio_e4").toDouble).sum /
        (daysAll * 10000.0)
      assert(math.abs(weighted - 1.0) < 0.01, s"$et weighted ratio $weighted")
    }
    sSpark.unpersist()
  }

  test("HLL range index answers within the sketch error of the exact distinct") {
    val est = operators.Sketches.hllRangeDemo(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_users")).toMap
    assert(est.nonEmpty)
    val span = Tables.events(spark, sf)
      .agg(expr("min((ts DIV 1000) DIV 86400000000)").as("d0"),
        expr("max((ts DIV 1000) DIV 86400000000)").as("d1")).head()
    val (d0, d1) = (span.getLong(0), span.getLong(1))
    val mid = (d1 - d0) / 4
    val exact = Tables.events(spark, sf)
      .filter(expr(s"(ts DIV 1000) DIV 86400000000 BETWEEN ${d0 + mid} AND ${d1 - mid}"))
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      val x = exact(k).toDouble
      assert(math.abs(e - x) / x <= 0.05, s"$k: est $e vs exact $x")
    }
  }

  test("percentile bands bracket the exact per-day percentiles") {
    val bands = TimeSeries.percentileBands(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(bands.nonEmpty)
    val byDay = Tables.events(spark, sf)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).sorted }
    assert(bands.keySet === byDay.keySet)
    bands.foreach { case (day, (p50, p95, n)) =>
      val vs = byDay(day)
      assert(n === vs.length.toLong)
      assert(p50 <= p95 + 1e-9)
      // KLL rank error (k=200): estimates sit within ±5% rank of exact
      def rankOf(x: Double): Double = vs.count(_ <= x).toDouble / vs.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.08, s"day $day p50 rank ${rankOf(p50)}")
      assert(rankOf(p95) >= 0.87, s"day $day p95 rank ${rankOf(p95)}")
    }
  }

  test("fileAudit counts files and flags small ones per partition leaf") {
    val dir = java.nio.file.Files.createTempDirectory("audit").toString
    val df = (0 until 100).map(i => (i % 4, i.toLong)).toDF("p", "v")
    df.repartition(3).write.partitionBy("p").parquet(s"$dir/t")
    val audit = Tables.fileAudit(spark, s"$dir/t").collect()
    assert(audit.length === 4)
    audit.foreach { r =>
      assert(r.getAs[String]("leaf").startsWith("p="))
      assert(r.getAs[Long]("n_files") === 3L)
      assert(r.getAs[Long]("small_files") === 3L) // tiny test files
      assert(r.getAs[Double]("total_mb") >= 0.0)
    }
    // flat (unpartitioned) table: one "." leaf
    df.repartition(2).write.parquet(s"$dir/flat")
    val flat = Tables.fileAudit(spark, s"$dir/flat").collect()
    assert(flat.length === 1 && flat.head.getAs[String]("leaf") === ".")
    assert(flat.head.getAs[Long]("n_files") === 2L)
  }

  private def ns(day: Long): Long = day * 86400000000000L + 1000000000L

  test("acf recovers a planted period-2 cycle and nulls a constant series") {
    val dir = java.nio.file.Files.createTempDirectory("acf").toString
    // type p: daily values alternate 100 / 200 over 14 days -> the lag-1
    // correlation is exactly -1, lag-2 exactly +1; type c is constant ->
    // zero variance, rho must be NULL, never NaN
    val rows = (0 until 14).map { d =>
      val v = if (d % 2 == 0) 100.0 else 200.0
      (d.toLong, ns(d), 1L, "p", v, "{}")
    } ++ (0 until 14).map { d => (100L + d, ns(d), 2L, "c", 50.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = TimeSeries.acf(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out(("p", 1L)) === ((13L, Some(-1.0))))
    assert(out(("p", 2L)) === ((12L, Some(1.0))))
    assert(out(("p", 7L))._1 === 7L)
    (1L to 7L).foreach { l => assert(out(("c", l))._2.isEmpty, s"constant lag $l") }
  }

  test("cusum alarms on a planted level shift and stays quiet on jitter") {
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    // 20 days alternating 100/101 (median 101.00, MAD 100 cents), then a
    // 3-day level shift to 500 -> the shift days breach 5*MAD immediately
    val rows = (0 until 23).map { d =>
      val v = if (d >= 20) 500.0 else if (d % 2 == 0) 100.0 else 101.0
      (d.toLong, ns(d), 1L, "s", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = TimeSeries.cusum(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("day")) ->
        ((r.getLong(r.fieldIndex("cusum_up")), r.getLong(r.fieldIndex("cusum_dn")),
          r.getLong(r.fieldIndex("alarm"))))).toMap
    assert(out.size === 23)
    out.foreach { case (d, (up, dn, _)) =>
      assert(up >= 0 && dn >= 0, s"day $d negative cusum") }
    (0L until 20L).foreach { d => assert(out(d)._3 === 0L, s"false alarm day $d") }
    (20L until 23L).foreach { d => assert(out(d)._3 === 1L, s"missed shift day $d") }
    // down-side never fires here: the shift is upward
    assert(out.values.forall { case (_, dn, _) => dn <= 500L })
  }

  test("alert episodes fuse consecutive breaches; lone spikes stay flagged-off") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val dayNs = 86400L * 1000000000L
    // A: 28 quiet days (1/day) then a 2-day incident (9, 8 events) →
    // p90 = 1, ONE actionable episode spanning days 28-29
    var id = 0L
    val rowsA = (0 until 28).map { d =>
      id += 1; (id, d * dayNs, 1L, "c", 1.0, "{}")
    } ++ (0 until 9).map { i => id += 1; (id, 28 * dayNs + i, 1L, "c", 1.0, "{}") } ++
      (0 until 8).map { i => id += 1; (id, 29 * dayNs + i, 1L, "c", 1.0, "{}") }
    val dirA = java.nio.file.Files.createTempDirectory("alerts").toString
    rowsA.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirA/events.parquet")
    val a = TimeSeries.alertEpisodes(spark, dirA).collect()
    assert(a.length === 1, s"got ${a.mkString(";")}")
    val r = a.head
    assert(r.getAs[Long]("start_day") === 28L && r.getAs[Long]("end_day") === 29L)
    assert(r.getAs[Long]("n_days") === 2L && r.getAs[Long]("peak_n") === 9L)
    assert(r.getAs[Long]("p90") === 1L && r.getAs[Long]("excess") === 15L)
    assert(r.getAs[Long]("actionable") === 1L)
    // B: lone one-day spike → episode visible but debounced (actionable 0)
    id = 0
    val rowsB = (0 until 10).map { d =>
      id += 1; (id, d * dayNs, 1L, "c", 1.0, "{}")
    } ++ (0 until 3).map { i => id += 1; (id, 5 * dayNs + i, 1L, "c", 1.0, "{}") }
    val dirB = java.nio.file.Files.createTempDirectory("alertsB").toString
    rowsB.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirB/events.parquet")
    val b = TimeSeries.alertEpisodes(spark, dirB).collect()
    assert(b.length === 1)
    assert(b.head.getAs[Long]("n_days") === 1L)
    assert(b.head.getAs[Long]("actionable") === 0L)
  }

  test("brown forecast: flat series has zero trend, linear ramp extrapolates") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val dayNs = 86400L * 1000000000L
    // 30 flat days at $2.00/day: level = 2.0, trend = 0, forecast = 2.0
    var id = 0L
    val flat = (0 until 30).map { d => id += 1; (id, d * dayNs, 1L, "c", 2.0, "{}") }
    val dirA = java.nio.file.Files.createTempDirectory("brown").toString
    flat.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirA/events.parquet")
    val a = TimeSeries.brownForecast(spark, dirA).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast_7d")))).toMap
    assert(a(29L) === ((2.0, 0.0, 2.0)), s"flat tail got ${a(29L)}")
    // a $1/day ramp far past the warm-up: trend ≈ 1, forecast ≈ level + 7
    id = 0
    val ramp = (0 until 40).map { d =>
      id += 1; (id, d * dayNs, 1L, "c", 1.0 * (d + 1), "{}") }
    val dirB = java.nio.file.Files.createTempDirectory("brownB").toString
    ramp.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirB/events.parquet")
    val b = TimeSeries.brownForecast(spark, dirB).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast_7d")))).toMap
    val (lvl, tr, fc) = b(39L)
    assert(math.abs(tr - 1.0) < 0.01, s"ramp trend $tr should be ~1")
    // level/trend/forecast are each rounded to 4dp independently, so the
    // identity holds to the accumulated rounding bound, not exactly
    assert(math.abs(fc - (lvl + 7 * tr)) < 1e-3, "forecast must be level + 7·trend")
    assert(math.abs(lvl - 40.0) < 0.1, s"ramp level $lvl should track the last value")
  }

  test("stl: a single spike decomposes into dow-seasonal and edge residuals exactly") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val dayNs = 86400L * 1000000000L
    // $2/day for 14 days with one +$7 spike on day 7
    var id = 0L
    val rows = (0 until 14).map { d =>
      id += 1; (id, d * dayNs, 1L, "c", if (d == 7) 9.0 else 2.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("stl").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = TimeSeries.stlDecompose(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("trend_c7"), r.getAs[Long]("seasonal_c7"),
          r.getAs[Long]("resid_c7")))).toMap
    // trend defined only on days 3..10 (centered ±3 neighborhood)
    assert(out.keySet === (3L to 10L).toSet, s"got ${out.keySet}")
    // hand arithmetic: t(3)=1400, t(4..10)=2100; detr: d3=0, d7=+4200, else −700;
    // dow(3)=dow(10)=0 → seasonal −350; dow(7)=4 → seasonal 4200
    assert(out(3L) === ((1400L, -350L, 350L)), s"d3 got ${out(3L)}")
    assert(out(7L) === ((2100L, 4200L, 0L)), s"d7 got ${out(7L)}")
    assert(out(10L) === ((2100L, -350L, -350L)), s"d10 got ${out(10L)}")
    assert(out(5L) === ((2100L, -700L, 0L)), s"d5 got ${out(5L)}")
  }

  test("seasonal strength: pure ramp is all trend, pure weekly pulse is all seasonality") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val dayNs = 86400L * 1000000000L
    def write(vals: Seq[Double]): String = {
      var id = 0L
      val rows = vals.zipWithIndex.map { case (v, d) =>
        id += 1; (id, d * dayNs, 1L, "c", v, "{}") }
      val dir = java.nio.file.Files.createTempDirectory("sstr").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    // ramp: centered MA-7 IS the series → detrended 0 → F_trend exact 1,
    // F_seasonal undefined (nothing left to explain)
    val ramp = TimeSeries.seasonalStrength(spark,
      write((1 to 14).map(_.toDouble))).collect().head
    assert(ramp.isNullAt(ramp.fieldIndex("f_seasonal_e4")), ramp.toString)
    assert(ramp.getAs[Long]("f_trend_e4") === 10000L, ramp.toString)
    // weekly pulse: the dow means absorb everything → F_seasonal exact 1,
    // trend is constant → F_trend undefined
    val pulse = TimeSeries.seasonalStrength(spark,
      write((0 until 21).map(d => if (d % 7 == 0) 7.0 else 0.0))).collect().head
    assert(pulse.getAs[Long]("f_seasonal_e4") === 10000L, pulse.toString)
    assert(pulse.isNullAt(pulse.fieldIndex("f_trend_e4")), pulse.toString)
  }

  test("holt-winters: flat is exact, ramp learns the trend, weekly pattern lands in seasonals") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val dayNs = 86400L * 1000000000L
    def write(vals: Seq[Double]): String = {
      var id = 0L
      val rows = vals.zipWithIndex.map { case (v, d) =>
        id += 1; (id, d * dayNs, 1L, "c", v, "{}") }
      val dir = java.nio.file.Files.createTempDirectory("hw").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    // flat $2/day: warm-up seeds level 2 / seasonals 0; recursion is a
    // fixed point, forecasts exactly 2
    val flat = TimeSeries.holtWinters(spark, write(Seq.fill(28)(2.0))).collect().head
    assert(flat.getAs[Double]("level") === 2.0 && flat.getAs[Double]("trend") === 0.0, flat.toString)
    assert(flat.getAs[Double]("fc_1d") === 2.0 && flat.getAs[Double]("fc_7d") === 2.0, flat.toString)
    // $1/day ramp: trend converges toward 1 (slowly — warm-up seasonals
    // absorb slope and decay at γ per weekly visit, hence the long series)
    val ramp = TimeSeries.holtWinters(spark,
      write((1 to 126).map(_.toDouble))).collect().head
    assert(math.abs(ramp.getAs[Double]("trend") - 1.0) < 0.1, ramp.toString)
    assert(math.abs(ramp.getAs[Double]("fc_1d") - 127.0) < 1.0, ramp.toString)
    // pure weekly pulse (7.0 on one dow, 0 otherwise): the 1-day-ahead
    // forecast must track the dow pattern, not the 1.0 mean
    val pulse = TimeSeries.holtWinters(spark,
      write((0 until 42).map(d => if (d % 7 == 0) 7.0 else 0.0))).collect().head
    // last day = 41 (dow pattern position 6); day 42 is a pulse day
    assert(math.abs(pulse.getAs[Double]("fc_1d") - 7.0) < 1.5, pulse.toString)
    assert(math.abs(pulse.getAs[Double]("fc_7d") - 0.0) < 1.5, pulse.toString)
  }

  test("backtest: hand-computed MAE/sMAPE for naive, snaive and ma7 on a $1/day ramp") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val dayNs = 86400L * 1000000000L
    // days 0..9 at $(d+1)/day: every hand value below follows from v(d) = 100·(d+1) cents
    var id = 0L
    val ramp = (0 until 10).map { d => id += 1; (id, d * dayNs, 1L, "c", 1.0 * (d + 1), "{}") }
    val dir = java.nio.file.Files.createTempDirectory("backtest").toString
    ramp.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = TimeSeries.backtest(spark, dir).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("mae_e2"), r.getAs[Long]("smape_e4")))).toMap
    assert(rows.keySet === Set("naive", "snaive", "ma7"))
    // naive: 9 pairs, each off by exactly $1 → MAE = 100 cents ×100
    assert(rows("naive") === ((9L, 10000L, 2518L)), s"naive got ${rows("naive")}")
    // snaive: 3 pairs (days 7..9), each off by $7
    assert(rows("snaive") === ((3L, 70000L, 13017L)), s"snaive got ${rows("snaive")}")
    // ma7: 3 full-history days, forecast trails actual by exactly $4
    assert(rows("ma7") === ((3L, 40000L, 5793L)), s"ma7 got ${rows("ma7")}")
  }
}
