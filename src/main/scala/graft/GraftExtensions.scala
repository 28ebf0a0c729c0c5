package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, HyperplaneBucket, MinHashSig, RollingMinHash, SimHash64}

/** SparkSessionExtensions entry point: registers the custom Catalyst
  * expressions as SQL functions for any session built with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * — the idiomatic way a Spark-native library ships operators (the
  * reference ships a Python DataSource registration instead;
  * reference: src/notebooks/demo/cdc_500_tables_streaming.py:106).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String) =
    new ExpressionInfo("graft.functions", name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("rolling_min_hash"), info("rolling_min_hash"),
      (es: Seq[Expression]) => RollingMinHash(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("hyperplane_bucket"), info("hyperplane_bucket"),
      (es: Seq[Expression]) => HyperplaneBucket(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        if (es.length > 2) es(2).eval().asInstanceOf[Number].intValue() else 0)))
    e.injectOptimizerRule(_ => graft.plans.RewriteTopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
