package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** The hashed-feature logistic-regression quality classifier: training
  * must separate a linearly separable planted corpus, scoring must be a
  * pure function of the weights, and the Gopher-distillation entry must
  * produce a full scored frame.
  */
class ClassifierSpec extends SparkSpec {

  test("train separates a planted two-vocabulary corpus") {
    import spark.implicits._
    val good = (1 to 40).map(i =>
      (i.toLong, s"clean prose sentence number $i with ample words", true))
    val bad = (1 to 40).map(i =>
      (100L + i, s"zz$i spam spam garbage garbage junk$i junk$i", false))
    val docs = (good ++ bad).toDF("doc_id", "text", "label")
    val w = Classifier.train(docs, "label", dim = 256, iters = 40)
    assert(w.length == 257)
    val scored = Classifier.score(docs.select("doc_id", "text"), w)
      .join(docs.select("doc_id", "label"), "doc_id")
    val acc = scored.filter((col("p") >= 0.5) === col("label")).count() / 80.0
    assert(acc >= 0.95, s"training accuracy $acc on a separable corpus")
    // full separation of the two vocabularies, not just 0.5-threshold wins
    val minGood = scored.filter(col("label")).agg(min("p")).head().getDouble(0)
    val maxBad = scored.filter(!col("label")).agg(max("p")).head().getDouble(0)
    assert(minGood > maxBad,
      s"score ranges overlap: min(good)=$minGood max(bad)=$maxBad")
  }

  test("score is deterministic given fixed weights") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val w = Array.tabulate(257)(i => (i % 7 - 3) * 0.1)
    val a = Classifier.score(docs, w).select("doc_id", "p").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Classifier.score(docs, w).select("doc_id", "p").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // two docs with different tokens get different scores under these weights
    assert(a(1L) != a(2L))
  }

  test("qualityScores covers the corpus and reports agreement") {
    val out = Classifier.qualityScores(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf).count()
    assert(out.count() == total)
    // distillation of a rule gate on its own training set should at least
    // match majority-class prediction
    val majority = math.max(
      out.filter(col("label")).count(), out.filter(!col("label")).count()).toDouble
    val agree = out.filter(col("agree")).count().toDouble
    assert(agree >= majority,
      s"classifier agrees on $agree of $total; majority baseline $majority")
  }
}
