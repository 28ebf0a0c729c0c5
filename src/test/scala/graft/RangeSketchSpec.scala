package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ranges, Sketches}

/** Bucketized range join (#97) and Count-Min heavy hitters (#98). */
class RangeSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized range join equals the naive inequality join") {
    val points = (1 to 500).map(i => (i % 7L, i.toLong * 10))
      .toDF("k", "p")
    val intervals = (1 to 40).map(i =>
      (i.toLong, i % 7L, i.toLong * 100 - 35, i.toLong * 100 + 65))
      .toDF("iv_id", "k", "lo", "hi")
    val bucketed = Ranges.bucketedRangeJoin(points, intervals,
      Seq("k"), "p", "lo", "hi", bucketWidth = 100L)
      .select("iv_id", "k", "p")
    val naive = points.as("p").join(intervals.as("i"),
      $"p.k" === $"i.k" && $"p.p" >= $"i.lo" && $"p.p" <= $"i.hi")
      .select($"i.iv_id", $"p.k", $"p.p")
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
    // and it must be an equi-join plan, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n$plan")
  }

  test("blast radius windows contain their own error event") {
    val df = Ranges.errorBlastRadius(spark, sf)
    assert(df.count() > 0)
    assert(df.filter(col("n_in_window") < 1).count() == 0)
  }

  test("morton layout tightens per-partition ranges on both dimensions") {
    val ev = Tables.events(spark, sf).select("user_id", "ts")
    def spanScore(df: org.apache.spark.sql.DataFrame): Double = {
      val stats = df.groupBy(spark_partition_id().as("p"))
        .agg((max("user_id") - min("user_id")).cast("double").as("su"),
          (max("ts") - min("ts")).cast("double").as("st"))
        .collect()
      stats.map(r => r.getDouble(1) * r.getDouble(2)).sum / stats.length
    }
    val random = spanScore(ev.repartition(16))
    val morton = spanScore(graft.operators.Layout.mortonLayout(ev, "user_id", "ts", 16))
    assert(morton < random / 2,
      s"morton layout span $morton not tighter than random $random")
  }

  test("quantile-rank morton layout survives an extreme outlier") {
    // one 10^9 outlier in a 0..999 column: min/max scaling would collapse
    // every regular row into rank-0 (one morton key → one partition);
    // quantile ranks keep the mass spread by construction
    val skewed = ((1 to 20000).map(i => ((i % 1000).toLong, i.toLong)) :+
      (1000000000L, 20001L)).toDF("k", "v")
    val laid = graft.operators.Layout.mortonLayout(skewed, "k", "v", 16)
    val sizes = laid.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.length >= 8, s"layout collapsed to ${sizes.length} partitions")
    val avg = sizes.sum.toDouble / sizes.length
    assert(sizes.max < 3 * avg,
      s"outlier collapsed the key space: partition sizes ${sizes.toSeq}")
  }

  test("partition pruning fires on the date-partitioned layout") {
    val dir = java.nio.file.Files.createTempDirectory("dp").toString
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts DIV 1000")).limit(5000)
    Tables.writeDatePartitioned(ev, "ts_us", dir)
    val day = spark.read.parquet(dir).select("__d").head().getDate(0)
    val filtered = spark.read.parquet(dir).filter(col("__d") === lit(day))
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(__d") ||
      plan.contains("PartitionFilters: [(__d"),
      s"date filter did not become a partition filter:\n$plan")
    assert(filtered.count() > 0)
  }

  test("count-min estimates bound exact counts on planted skew") {
    val skewed = ((1 to 20000).map(_ => 1L) ++ (1 to 5000).map(i => (i % 100 + 2).toLong))
      .toDF("user_id").withColumn("x", lit(1))
    val sk = Sketches.cmSketch(skewed, "user_id")
    val exact = skewed.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 25000L
    exact.foreach { case (k, cnt) =>
      val est = sk.estimateCount(k)
      assert(est >= cnt, s"CM underestimated key $k: $est < $cnt")
      assert(est <= cnt + (Sketches.Eps * n).toLong + 1,
        s"CM overestimated key $k beyond eps*N: $est vs $cnt")
    }
  }

  test("heavy hitters query is deterministic and within bounds") {
    val a = Sketches.heavyHitters(spark, sf).collect()
    val b = Sketches.heavyHitters(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "sketch result not deterministic")
    assert(a.forall(_.getAs[Boolean]("within_bound")))
  }

  test("HLL union of fine sketches stays inside the sketch error envelope") {
    val rows = Sketches.hllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // union==direct is NOT an invariant (mode promotion can change the
      // estimator at identical lgK — observed at sf0.01); the guarantee is
      // the error envelope on BOTH estimates.
      // lgConfigK=14 → relative error ~1.04/sqrt(2^14) ≈ 0.8%; allow 3σ
      val exact = r.getAs[Long]("exact_distinct").toDouble
      Seq("union_estimate", "direct_estimate").foreach { c =>
        val est = r.getAs[Long](c).toDouble
        assert(math.abs(est - exact) / exact <= 0.025,
          s"${r.getAs[String]("l_returnflag")} $c $est vs exact $exact drifts past 2.5%")
      }
      assert(r.getAs[Boolean]("union_within_3pct"))
    }
  }
}
