package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Profile, TimeSeries}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

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
}
