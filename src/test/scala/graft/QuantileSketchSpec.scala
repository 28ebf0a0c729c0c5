package graft

import org.apache.spark.sql.functions._
import graft.functions.{QuantileSketch, QuantileSketchAgg}

/** Mergeable KLL-style quantile sketch (SURVEY §2 #114): exactness below
  * capacity, bounded rank error above it, merge/serialization round-trip,
  * and the registered query's error vs the exact percentiles.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rankError(values: Array[Double], est: Double, p: Double): Double = {
    val sorted = values.sorted
    val rank = sorted.count(_ <= est).toDouble / sorted.length
    math.abs(rank - p)
  }

  test("sketch is exact while the group fits one compactor") {
    val sk = new QuantileSketch(200)
    (1 to 99).foreach(i => sk.insert(i.toDouble))
    assert(sk.quantile(0.5) == 50.0)
    assert(sk.quantile(0.95) == 95.0) // ceil(0.95*99)=95th value
    assert(sk.quantile(0.0) == 1.0 && sk.quantile(1.0) == 99.0)
  }

  test("rank error stays bounded far past capacity, and serde round-trips") {
    val n = 100000
    val sk = new QuantileSketch(200)
    // adversarial insertion order: descending, so compactions see sorted runs
    (n to 1 by -1).foreach(i => sk.insert(i.toDouble))
    val values = (1 to n).map(_.toDouble).toArray
    Seq(0.1, 0.5, 0.9, 0.95, 0.99).foreach { p =>
      val err = rankError(values, sk.quantile(p), p)
      assert(err <= 0.02, s"rank error $err at p=$p")
    }
    val back = QuantileSketch.deserialize(sk.serialize(), 200)
    assert(back.n == sk.n)
    Seq(0.5, 0.95).foreach(p => assert(back.quantile(p) == sk.quantile(p)))
    // the O(k log(n/k)) state claim, in bytes: k=200 doubles per level,
    // ~log2(100k/200)=9 levels — far under 64 KiB (vs 800 KB raw values)
    assert(sk.serialize().length < 64 * 1024,
      s"sketch state grew to ${sk.serialize().length} bytes")
  }

  test("merge of disjoint sketches bounds error like a single pass") {
    val a = new QuantileSketch(200)
    val b = new QuantileSketch(200)
    (1 to 50000).foreach(i => a.insert(i.toDouble))
    (50001 to 100000).foreach(i => b.insert(i.toDouble))
    val merged = a.merge(b)
    assert(merged.n == 100000)
    val values = (1 to 100000).map(_.toDouble).toArray
    Seq(0.25, 0.5, 0.75, 0.95).foreach { p =>
      val err = rankError(values, merged.quantile(p), p)
      assert(err <= 0.02, s"post-merge rank error $err at p=$p")
    }
  }

  test("aggregate matches exact percentiles within 3% rank error per group") {
    val est = operators.Tpch.qPercentilesSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val groups = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0)).map { case (g, rows) =>
        g -> rows.map(_.getDouble(1))
      }
    assert(est.keySet == groups.keySet)
    groups.foreach { case (g, values) =>
      val (p50, p95) = est(g)
      assert(rankError(values, p50, 0.5) <= 0.03, s"group $g p50 off")
      assert(rankError(values, p95, 0.95) <= 0.03, s"group $g p95 off")
    }
  }

  test("map-side partial aggregation: result independent of partitioning within bounds") {
    val df = (1 to 20000).map(i => ("g", (i % 997).toDouble)).toDF("g", "v")
    def run(parts: Int): Double =
      df.repartition(parts).groupBy("g")
        .agg(QuantileSketchAgg.quantileSketch(col("v"), Seq(0.5)).as("q"))
        .select(element_at(col("q"), 1)).head().getDouble(0)
    val values = (1 to 20000).map(i => (i % 997).toDouble).toArray
    Seq(1, 4, 17).foreach { parts =>
      val err = rankError(values, run(parts), 0.5)
      assert(err <= 0.02, s"rank error $err with $parts partitions")
    }
  }
}
