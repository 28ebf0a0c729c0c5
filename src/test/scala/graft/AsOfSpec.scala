package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Generic as-of join semantics: inclusive tie matching, per-key
  * isolation, missing-prior nulls, staleness tolerance, determinism.
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def frames = {
    val left = Seq(
      (1L, "k1", 100L), // exact tie with right @100 → matches it
      (2L, "k1", 150L), // between rights → latest prior (100)
      (3L, "k1", 500L), // far after → still 200, unless tolerance
      (4L, "k2", 50L), // no prior on its key → nulls
      (5L, "k3", 10L) // key with no right rows at all
    ).toDF("l_id", "k", "t")
    val right = Seq(
      (10L, "k1", 80L, "a"),
      (11L, "k1", 100L, "b"),
      (12L, "k1", 200L, "c"),
      (13L, "k2", 60L, "d")
    ).toDF("r_id", "k", "r_t", "payload")
    (left, right)
  }

  private def run(tol: Option[Long]) = {
    val (l, r) = frames
    AsOf.asofJoin(l, r, keyCols = Seq("k"), leftTime = "t", rightTime = "r_t",
      carryCols = Seq("r_id", "payload"), tiebreak = Seq("l_id", "r_id"),
      tolerance = tol)
      .collect()
      .map(x => x.getAs[Long]("l_id") ->
        (Option(x.getAs[java.lang.Long]("asof_r_id")).map(_.toLong),
          x.getAs[String]("asof_payload")))
      .toMap
  }

  test("latest-prior matching with inclusive ties and per-key isolation") {
    val m = run(None)
    assert(m(1L) == ((Some(11L), "b")), "tie (t == r_t) must match")
    assert(m(2L) == ((Some(11L), "b")), "latest prior, not earliest")
    assert(m(3L) == ((Some(12L), "c")))
    assert(m(4L) == ((None, null)), "future right rows must not match")
    assert(m(5L) == ((None, null)), "unseen key must not match")
  }

  test("tolerance nulls stale matches but keeps the left rows") {
    val m = run(Some(100L))
    assert(m(1L) == ((Some(11L), "b"))) // age 0 ≤ 100
    assert(m(2L) == ((Some(11L), "b"))) // age 50 ≤ 100
    assert(m(3L) == ((None, null)), "age 300 > 100 must degrade to no-match")
    assert(m.size == 5, "tolerance must never drop left rows")
  }

  test("randomized as-of equals the naive quadratic join") {
    val rnd = new scala.util.Random(42)
    val lrows = (1 to 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(100).toLong))
    val rrows = (1 to 300).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(8)}", rnd.nextInt(100).toLong, s"p$i"))
    val got = AsOf.asofJoin(
      lrows.toDF("l_id", "k", "t"), rrows.toDF("r_id", "k", "r_t", "payload"),
      keyCols = Seq("k"), leftTime = "t", rightTime = "r_t",
      carryCols = Seq("r_id", "payload"), tiebreak = Seq("l_id", "r_id"))
      .collect()
      .map(x => x.getAs[Long]("l_id") ->
        Option(x.getAs[java.lang.Long]("asof_r_id")).map(_.toLong)).toMap
    lrows.foreach { case (lid, k, t) =>
      val cands = rrows.filter(r => r._2 == k && r._3 <= t)
      val want =
        if (cands.isEmpty) None
        else {
          val maxT = cands.map(_._3).max
          Some(cands.filter(_._3 == maxT).map(_._1).max) // ties → largest r_id
        }
      assert(got(lid) == want, s"left $lid (k=$k, t=$t): got ${got(lid)}, want $want")
    }
  }

  test("randomized forward as-of equals the naive quadratic join") {
    val rnd = new scala.util.Random(7)
    val lrows = (1 to 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(100).toLong))
    val rrows = (1 to 300).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(8)}", rnd.nextInt(100).toLong, s"p$i"))
    val got = AsOf.asofJoin(
      lrows.toDF("l_id", "k", "t"), rrows.toDF("r_id", "k", "r_t", "payload"),
      keyCols = Seq("k"), leftTime = "t", rightTime = "r_t",
      carryCols = Seq("r_id", "payload"), tiebreak = Seq("l_id", "r_id"),
      direction = "forward")
      .collect()
      .map(x => x.getAs[Long]("l_id") ->
        Option(x.getAs[java.lang.Long]("asof_r_id")).map(_.toLong)).toMap
    lrows.foreach { case (lid, k, t) =>
      val cands = rrows.filter(r => r._2 == k && r._3 >= t)
      val want =
        if (cands.isEmpty) None
        else {
          val minT = cands.map(_._3).min
          Some(cands.filter(_._3 == minT).map(_._1).min) // ties → smallest r_id
        }
      assert(got(lid) == want, s"left $lid (k=$k, t=$t): got ${got(lid)}, want $want")
    }
  }

  test("forward tolerance nulls matches beyond the horizon") {
    import spark.implicits._
    val l = Seq((1L, "a", 100L), (2L, "a", 10L)).toDF("l_id", "k", "t")
    val r = Seq((9L, "a", 105L), (8L, "a", 200L)).toDF("r_id", "k", "r_t")
    val m = AsOf.asofJoin(l, r, Seq("k"), "t", "r_t", Seq("r_id"),
      tiebreak = Seq("l_id", "r_id"), tolerance = Some(20L), direction = "forward")
      .collect().map(x => x.getAs[Long]("l_id") ->
        Option(x.getAs[java.lang.Long]("asof_r_id"))).toMap
    assert(m(1L).contains(9L), "match inside tolerance kept")
    assert(m(2L).isEmpty, "match 95us ahead must null at tolerance 20")
  }

  test("carry-column collisions are rejected loudly") {
    val (l, r) = frames
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r.withColumnRenamed("r_id", "l_id"), Seq("k"), "t", "r_t",
        carryCols = Seq("l_id", "payload"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("merge exec equals the union+window path on the full corpus") {
    import graft.cdc.Cdc
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(Cdc.asofJoinViaExec(spark, sf)) ===
      canon(Cdc.asofJoin(spark, sf)), "exec diverged from union+window")
    // and with a tolerance bound
    assert(canon(Cdc.asofJoinViaExec(spark, sf, Some(600000000L))) ===
      canon(Cdc.asofJoin(spark, sf, Some(600000000L))),
      "exec tolerance semantics diverged")
  }

  test("merge exec: ties, tolerance, per-key isolation on planted rows") {
    import spark.implicits._
    import graft.plans.AsOfJoinOp
    val l = Seq((1L, "a", 100L), (2L, "a", 5L), (3L, "b", 100L), (4L, "c", 50L))
      .toDF("l_id", "k", "t")
    val r = Seq(
      (10L, "a", 100L), (11L, "a", 100L), // equal times: largest r_id wins
      (12L, "a", 40L),
      (20L, "b", 999L),                   // future only: no match for b
      (30L, "c", 1L))                     // stale beyond tolerance
      .toDF("r_id", "k", "r_t")
    val out = AsOfJoinOp.asofJoinExec(l, r, Seq("k"), "t", "r_t",
      carryCols = Seq("r_id"), tiebreak = Seq("r_id"), tolerance = Some(20L))
      .collect().map(x => x.getAs[Long]("l_id") ->
        Option(x.getAs[java.lang.Long]("asof_r_id"))).toMap
    assert(out(1L).contains(11L), s"tie must pick largest r_id: ${out(1L)}")
    assert(out(2L).isEmpty, "no right row at or before t=5")
    assert(out(3L).isEmpty, "future right rows must not match backward")
    assert(out(4L).isEmpty, "match at distance 49 must null at tolerance 20")
    // the physical plan actually uses the custom operator
    val p = AsOfJoinOp.asofJoinExec(l, r, Seq("k"), "t", "r_t", Seq("r_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoinMerge"), s"custom exec not planned:\n$p")
    assert(!p.contains("WindowExec") && !p.toLowerCase.contains("window ["),
      s"merge exec must not fall back to windows:\n$p")
  }
}
