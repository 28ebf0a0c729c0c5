package graft

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import graft.plans.Lineage

/** Column-level lineage extraction: source attribution, via-tag
  * escalation, generator/window/union handling.
  */
class LineageSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    Lineage.columnLineage(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet

  test("star aggregate lineage: direct key, aggregate measures, literal count") {
    val got = rows(graft.plans.Mv.starQuery(spark, sf))
    assert(got == Set(
      ("n_name", "nation", "n_name", "direct"),
      ("revenue", "lineitem", "l_extendedprice", "aggregate"),
      ("revenue", "lineitem", "l_discount", "aggregate"),
      ("n_items", "", "", "literal")), got.toString)
  }

  test("generator, window, and expression tags escalate correctly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("rnk",
        row_number().over(W.partitionBy("doc_id").orderBy("tok")))
      .select(col("doc_id"), upper(col("tok")).as("tok_u"), col("rnk"))
    val got = rows(q)
    assert(got == Set(
      ("doc_id", "documents", "doc_id", "direct"),
      ("tok_u", "documents", "text", "generator"),
      // rnk orders by tok (from text) and partitions by doc_id
      ("rnk", "documents", "text", "window"),
      ("rnk", "documents", "doc_id", "window")), got.toString)
  }

  test("union merges provenance positionally") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("k"))
    val got = rows(o.unionByName(l))
    assert(got == Set(
      ("k", "orders", "o_orderkey", "direct"),
      ("k", "lineitem", "l_orderkey", "direct")), got.toString)
  }
}
