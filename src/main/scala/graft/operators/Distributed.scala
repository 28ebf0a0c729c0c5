package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed-sort ranking — exact global ranks per key group WITHOUT a
  * low-cardinality window partition.
  *
  * `row_number() over (partition by k order by …)` funnels every row of a
  * key through ONE reducer; with few distinct keys that is a scale-killer.
  * Here the rank comes from a distributed sort: range-repartition on
  * (keys…, order…), count rows per (range-partition, keys) — a tiny frame
  * — turn the counts into cumulative offsets, rank locally per partition,
  * add the offset. Per-task work is bounded by partition size at ANY key
  * cardinality, and the result is identical to the window (range-sampler
  * boundary placement cannot affect it: offsets come from actual counts).
  */
object Distributed {

  /** Adds exact `rankCol` (1-based, per keyCols group, ordered by
    * orderCols) and `totalCol` (group size).
    */
  def exactRank(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      rankCol: String = "rnk", totalCol: String = "n_total"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, (keyCols ++ orderCols).map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val counts = sorted.groupBy(("__pid" +: keyCols).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(keyCols.map(col): _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__offset", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn(totalCol,
        sum("__cnt").over(Window.partitionBy(keyCols.map(col): _*)))
      .select((("__pid" +: keyCols).map(col) :+ col("__offset") :+ col(totalCol)): _*)
    val wLocal = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    sorted.join(broadcast(offsets), "__pid" +: keyCols)
      .withColumn(rankCol, row_number().over(wLocal) + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Adds `bucketCol` = SQL-standard NTILE(n) bucket (first N mod n
    * buckets hold ceil(N/n) rows) — a pure function of (rank, N) applied
    * row-locally on top of [[exactRank]].
    */
  def exactNtile(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      n: Int, bucketCol: String = "bucket"): DataFrame =
    exactRank(df, keyCols, orderCols)
      .withColumn(bucketCol, expr(
        s"""CAST(CASE
           |  WHEN rnk <= (n_total % $n) * (n_total DIV $n + 1)
           |  THEN (rnk + n_total DIV $n) DIV (n_total DIV $n + 1)
           |  ELSE n_total % $n
           |    + (rnk - (n_total % $n) * (n_total DIV $n + 1) + greatest(1, n_total DIV $n) - 1)
           |      DIV greatest(1, n_total DIV $n)
           |END AS INT)""".stripMargin))
      .drop("rnk", "n_total")
}
