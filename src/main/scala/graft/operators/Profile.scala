package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** One-pass per-column table profiling — the Deequ-style onboarding audit
  * a 500-table CDC registry runs before enabling a table (reference:
  * table_manager.py discovers row counts only; real onboarding needs
  * nullability, cardinality, and shape per column).
  *
  * ONE aggregation over the table produces every column's row count, null
  * count, exact distinct count, and (for strings) length extrema; the
  * single summary row then unpivots via `stack` — the same
  * aggregate-then-stack shape as the expectations audit. Multiple exact
  * COUNT(DISTINCT) columns plan as Spark's Expand (input rows × columns
  * before partial aggregation, still ONE shuffle); at 100 TB swap
  * `approx_count_distinct` in via `exact = false` and the Expand
  * disappears — exact is the default so the DuckDB oracle can match
  * hash-for-hash.
  */
object Profile {

  def tableProfile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg.as(s"${c}__distinct")) ++
      (df.schema(c).dataType match {
        case StringType => Seq(
          min(length(col(c))).cast("long").as(s"${c}__minlen"),
          max(length(col(c))).cast("long").as(s"${c}__maxlen"))
        case _ => Seq(
          lit(null).cast("long").as(s"${c}__minlen"),
          lit(null).cast("long").as(s"${c}__maxlen"))
      })
    }
    val summary = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__minlen`, `${c}__maxlen`"
    ).mkString(", ")
    summary.selectExpr("__n_rows AS n_rows",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_len, max_len)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_len", "max_len")
  }

  /** #218 Exact pre-flight join-cardinality profile: the output size of
    * `left ⋈ right` on an equi-key, priced WITHOUT executing the join.
    * Each side reduces to a per-key count profile (key-cardinality-sized,
    * not data-sized); `sum(cl·cr)` over the profile join is the exact
    * output row count and `max(cl·cr)` the single hottest key — the two
    * numbers the broadcast / salting / skew-hint decision needs before
    * committing a 100 TB × 100 TB shuffle.
    */
  def joinCardinalityOn(left: DataFrame, leftKey: String,
                        right: DataFrame, rightKey: String): DataFrame = {
    val lp = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val rp = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    // ONE full-outer profile join feeds every statistic: each side's
    // aggregate is consumed exactly once (no branch recompute), and the
    // join key equals the groupBy key so the join adds NO exchange beyond
    // the two profile shuffles
    lp.join(rp, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(col("cl")), lit(0L)).cast("long").as("n_left"),
        coalesce(sum(col("cr")), lit(0L)).cast("long").as("n_right"),
        count(col("cl")).as("distinct_left_keys"),
        count(col("cr")).as("distinct_right_keys"),
        sum(when(col("cl").isNotNull && col("cr").isNotNull, 1L).otherwise(0L))
          .as("n_matching_keys"),
        coalesce(sum(col("cl") * col("cr")), lit(0L)).cast("long").as("predicted_rows"),
        coalesce(max(col("cl") * col("cr")), lit(0L)).cast("long").as("max_key_rows"))
      .select("n_left", "n_right", "distinct_left_keys", "distinct_right_keys",
        "n_matching_keys", "predicted_rows", "max_key_rows")
  }

  /** #244 Join strategy advisor: the [[joinCardinalityOn]] numbers turned
    * into the decision a planner (or an engineer staring at a 100 TB
    * shuffle) actually makes — broadcast the smaller side when it fits,
    * flag skew-salting when one key dominates, otherwise a plain
    * shuffled hash/sort-merge join. Thresholds are explicit parameters,
    * not magic; the row estimate used for the broadcast test is exact.
    */
  def joinAdvisor(left: DataFrame, leftKey: String,
                  right: DataFrame, rightKey: String,
                  broadcastMaxRows: Long = 1000000L,
                  skewRatioE2: Long = 2000L): DataFrame =
    joinCardinalityOn(left, leftKey, right, rightKey)
      .withColumn("skew_ratio_e2",
        expr("CASE WHEN predicted_rows = 0 THEN 0 " +
          "ELSE max_key_rows * 100 * n_matching_keys DIV predicted_rows END"))
      .withColumn("strategy",
        when(col("n_right") <= broadcastMaxRows, "broadcast_right")
          .when(col("n_left") <= broadcastMaxRows, "broadcast_left")
          .when(col("skew_ratio_e2") >= skewRatioE2, "shuffle_salted")
          .otherwise("shuffle_hash"))
}
