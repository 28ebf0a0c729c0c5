package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * At 100 TB a handful of hot keys (one table producing most CDC traffic —
  * the reference's priority tables, table_manager.py:172-204) can pin a
  * single reducer. `saltedSumCount` runs the classic two-stage aggregation:
  * stage 1 groups on (key, salt) spreading each hot key over `salts`
  * reducers with map-side partial aggregation; stage 2 merges the per-salt
  * partials. AQE's skew handling covers joins; this covers aggregations.
  */
object Skew {

  /** Retry-stable salt in [0, salts): hash of every data column plus the
    * caller's `disambiguators`.
    *
    * The salt must be DETERMINISTIC per row — a positional counter
    * (monotonically_increasing_id / rand) changes on task retry after a
    * fetch failure and silently corrupts the aggregate (the SPARK-23207
    * round-robin-repartition bug class). Hashing the WHOLE row is both
    * retry-stable and value-spread: a hot key with a constant aggregate
    * value still fans out over its other columns.
    *
    * Fully identical duplicate rows, however, share a salt — a hot key
    * made of byte-identical duplicates degrades back to one reducer. For
    * duplicate-heavy file-source inputs pass retry-stable POSITIONAL
    * disambiguators: `col("_metadata.file_path")` +
    * `col("_metadata.row_index")` distinguish physical rows and are
    * recomputed identically on retry (unlike a positional counter).
    */
  def retryStableSalt(df: DataFrame, salts: Int,
      disambiguators: Seq[Column] = Nil): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col) ++ disambiguators: _*), lit(salts))

  /** Two-stage salted sum/count for the named numeric column. Returns
    * (keyCols..., sum_<col>, cnt) — same groups and totals as a direct
    * groupBy (double sums may differ in final ulps from summation order),
    * but no reducer sees more than ~1/salts of any key's rows. See
    * [[retryStableSalt]] for salt semantics and when to supply
    * `disambiguators` (duplicate-heavy inputs).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16, disambiguators: Seq[Column] = Nil): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val salted = df.withColumn("__salt", retryStableSalt(df, salts, disambiguators))
    val partial = salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** #338 Skew-salted shuffle equi-join — the JOIN counterpart of
    * [[saltedSumCount]], for the regime where the build side is too big
    * to broadcast but ≪ the fact side, and one hot fact key would pin a
    * reducer. The fact side tags each row with its [[retryStableSalt]];
    * the build side replicates ×salts MAP-SIDE (explode of a literal
    * sequence — no shuffle of its own); the join key becomes
    * (key, salt), spreading each hot key over `salts` reducers. The
    * shuffle-hash hint keeps the demonstration honest (Spark would
    * otherwise broadcast a small build side and skip the salted shuffle
    * entirely). Replication × salting is a partition of unity, so the
    * result is row-identical to the plain equi-join — the registered
    * query proves it against the plain-join DuckDB oracle. AQE's
    * skew-join split repairs sort-merge skew after the fact; salting
    * shapes the partitioning before it.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      salts: Int = 16, disambiguators: Seq[Column] = Nil): DataFrame = {
    require(!fact.columns.contains("__salt") && !build.columns.contains("__salt"),
      "input already has a column named __salt")
    val saltedFact = fact.withColumn("__salt",
      retryStableSalt(fact, salts, disambiguators))
    val replicated = build.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
      .hint("shuffle_hash")
    saltedFact.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
