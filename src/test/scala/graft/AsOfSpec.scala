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

  test("carry-column collisions are rejected loudly") {
    val (l, r) = frames
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r.withColumnRenamed("r_id", "l_id"), Seq("k"), "t", "r_t",
        carryCols = Seq("l_id", "payload"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
