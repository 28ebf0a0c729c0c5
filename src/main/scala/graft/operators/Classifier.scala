package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** fastText-style quality classifier: logistic regression over
  * hashing-trick token features, trained distributed with a driver loop.
  *
  * This is the standard production move for corpus filtering (GPT-3's
  * LR-over-tf-idf quality model, CCNet's fastText classifier): cheap rule
  * gates (Gopher) label a seed set, a linear model DISTILLS the gate into
  * a smooth score that generalizes past the rules' hard edges and is
  * orders of magnitude cheaper to apply than an LM. Here the weak labels
  * come from [[Text.docQualityGopher]], so the whole demo is
  * self-contained and reproducible.
  *
  * Scale shape (the same contract as the BPE trainer and the PQ Lloyd
  * loop): the MODEL is driver-held (dim+1 doubles — tiny by construction;
  * the hashing trick fixes the dimensionality no matter how large the
  * vocabulary grows), the CORPUS work is distributed. The sparse feature
  * table is built ONCE (tokenize → hash → per-doc L1 normalize, one
  * shuffle) and cached as a compact per-document record; after that each
  * full-batch gradient-descent step is a single ZERO-SHUFFLE
  * `treeAggregate` job — broadcast the weights out, fold the dim+1-double
  * gradient up through a two-level combine tree (MLlib's own
  * GradientDescent shape, mllib/optimization/GradientDescent.scala). No
  * per-iteration joins, no per-iteration exchange; nothing corpus-sized
  * ever reaches the driver.
  */
object Classifier {

  /** Sparse L1-normalized hashed-unigram features: (doc_id, bucket, x). */
  private def featurize(docs: DataFrame, dim: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), pmod(xxhash64(col("tok")), lit(dim)).as("bucket"))
    val cnt = toks.groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    val len = cnt.groupBy("doc_id").agg(sum("cnt").as("len"))
    cnt.join(len, "doc_id")
      .select(col("doc_id"), col("bucket"),
        (col("cnt").cast("double") / col("len")).as("x"))
  }

  /** Trains on any frame with (doc_id, text, `labelCol` boolean); returns
    * the weight vector (index dim = bias). Full-batch GD, deterministic
    * up to float-summation order.
    */
  def train(docs: DataFrame, labelCol: String, dim: Int = 1024,
      iters: Int = 30, lr: Double = 2.0): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one compact record per document (label, bucket ids, weights),
    // computed with a single shuffle and cached as an RDD so every GD
    // step re-reads decoded primitives, not Tungsten rows
    val data = featurize(docs, dim)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("bucket"), col("x"))).as("feat"))
      // right join: docs whose text hashed to zero tokens still carry a
      // label and a bias contribution
      .join(docs.select(col("doc_id"),
        col(labelCol).cast("double").as("y")), Seq("doc_id"), "right")
      .select(col("y"), coalesce(col("feat"),
        array().cast("array<struct<bucket:bigint,x:double>>")).as("feat"))
      .as[(Double, Seq[(Long, Double)])]
      .rdd
      .map { case (y, f) =>
        (y, f.map(_._1.toInt).toArray, f.map(_._2).toArray)
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count().toDouble
    val w = Array.fill(dim + 1)(0.0)
    val sc = spark.sparkContext
    for (_ <- 0 until iters) {
      // one zero-shuffle job per step: weights ride down as a broadcast,
      // the dim+1-double gradient folds up the combine tree
      val bw = sc.broadcast(w)
      val grad = data.treeAggregate(new Array[Double](dim + 1))(
        seqOp = { case (g, (y, bs, xs)) =>
          val wv = bw.value
          var dot = wv(dim)
          var i = 0
          while (i < bs.length) { dot += xs(i) * wv(bs(i)); i += 1 }
          val r = 1.0 / (1.0 + math.exp(-dot)) - y
          i = 0
          while (i < bs.length) { g(bs(i)) += r * xs(i); i += 1 }
          g(dim) += r
          g
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      bw.destroy()
      var i = 0
      while (i < w.length) { w(i) -= lr * grad(i) / n; i += 1 }
    }
    data.unpersist()
    w
  }

  /** Applies a trained model row-distributed: broadcast weight frame,
    * one groupBy(doc) — the same single-shuffle shape as a train step.
    */
  def score(docs: DataFrame, w: Array[Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = w.length - 1
    val wDf = w.take(dim).zipWithIndex
      .map { case (wt, b) => (b.toLong, wt) }.toSeq.toDF("bucket", "wt")
    val margins = featurize(docs, dim).join(broadcast(wDf), "bucket")
      .groupBy("doc_id").agg(sum(col("x") * col("wt")).as("dot"))
    docs.join(margins, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("dot"))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-(col("dot") + lit(w(dim))))))
      .drop("dot")
  }

  /** The driver-facing query: distill the Gopher gate on `documents`,
    * score every doc, report agreement. Float aggregation order makes the
    * last ulp of `p` run-dependent, so the entry is rows-only checked;
    * ClassifierSpec pins separation and accuracy on planted corpora.
    */
  def qualityScores(spark: SparkSession, dir: String, iters: Int = 12): DataFrame = {
    val labeled = Tables.documents(spark, dir)
      .join(Text.docQualityGopher(spark, dir).select("doc_id", "passes_gopher"),
        "doc_id")
    // the rule gate is close to linearly separable in token space, so the
    // distillation converges in ~a dozen full-batch steps; each step is a
    // fixed number of jobs, so iters is the direct knob on wall-clock
    val w = train(labeled, "passes_gopher", iters = iters)
    score(labeled.select("doc_id", "text", "passes_gopher"), w)
      .select(col("doc_id"), col("passes_gopher").as("label"),
        round(col("p"), 4).as("p_round"),
        (col("p") >= 0.5).as("predicted"))
      .withColumn("agree", col("predicted") === col("label"))
  }
}
