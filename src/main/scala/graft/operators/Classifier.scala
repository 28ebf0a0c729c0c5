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
  * vocabulary grows), the CORPUS work is distributed. Each full-batch
  * gradient-descent step is one job: margins via a broadcast join of the
  * (≤dim)-row weight frame against the cached sparse feature table
  * (groupBy doc), residuals row-local, gradient via ONE bucket
  * aggregation (partial-agg friendly, ≤dim+1 result rows collected).
  * Nothing corpus-sized ever reaches the driver, and the feature table is
  * computed once and persisted across iterations.
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
    // cache BOTH sides hash-partitioned on doc_id: every iteration's
    // margin groupBy(doc_id), label join, and residual⋈feature join then
    // reuse this partitioning, so the only per-iteration exchange is the
    // ≤dim-row gradient aggregation
    val feats = featurize(docs, dim).repartition(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val labels = docs.select(col("doc_id"),
        col(labelCol).cast("double").as("y"))
      .repartition(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = labels.count().toDouble
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val wDf = w.take(dim).zipWithIndex
        .map { case (wt, b) => (b.toLong, wt) }.toSeq.toDF("bucket", "wt")
      val margins = feats.join(broadcast(wDf), "bucket")
        .groupBy("doc_id").agg(sum(col("x") * col("wt")).as("dot"))
      val resid = labels.join(margins, Seq("doc_id"), "left")
        .na.fill(0.0, Seq("dot"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-(col("dot") + lit(w(dim))))) - col("y"))
            .as("r"))
      // gradient: ONE bucket aggregation + the bias row, ≤dim+1 rows back
      val grad = resid.join(feats, "doc_id")
        .groupBy("bucket").agg(sum(col("r") * col("x")).as("g"))
        .unionByName(resid.agg(sum("r").as("g")).select(lit(dim.toLong).as("bucket"), col("g")))
        .collect()
      grad.foreach { row =>
        val b = row.getLong(0).toInt
        w(b) -= lr * row.getDouble(1) / n
      }
    }
    feats.unpersist(); labels.unpersist()
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
