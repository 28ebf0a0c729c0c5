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

  private val Pid = "__graft_pid"

  /** Range-repartition + tag the physical partition id, MATERIALIZED
    * (eager localCheckpoint) before anyone consumes it. The freeze is
    * correctness-critical, not an optimization: the offsets branch and
    * the ranking branch both key on `spark_partition_id()`, and without a
    * barrier each branch re-reads the exchange through its OWN
    * AQEShuffleRead — AQE may coalesce/split the two reads differently,
    * the Pids stop corresponding, and ranks silently duplicate or exceed
    * n (reproduced at small partition sizes; nondeterministic run to
    * run). Checkpointing computes the partitioning ONCE and hands both
    * branches the same frozen partitions.
    */
  private def rangeSortedWithPid(df: DataFrame, cols: Seq[String]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(parts, cols.map(col): _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint()
  }

  /** Adds exact `rankCol` (1-based, per keyCols group, ordered by
    * orderCols) and `totalCol` (group size). Fails fast if the input
    * already carries a column with one of those names.
    */
  def exactRank(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      rankCol: String = "rnk", totalCol: String = "n_total"): DataFrame = {
    Seq(rankCol, totalCol, Pid).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val sorted = rangeSortedWithPid(df, keyCols ++ orderCols)
    val counts = sorted.groupBy((Pid +: keyCols).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(keyCols.map(col): _*).orderBy(Pid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__offset", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn(totalCol,
        sum("__cnt").over(Window.partitionBy(keyCols.map(col): _*)))
      .select(((Pid +: keyCols).map(col) :+ col("__offset") :+ col(totalCol)): _*)
    val wLocal = Window.partitionBy((Pid +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // null-SAFE join on the keys: a plain equi-join would silently drop
    // every NULL-key row, where row_number ranks them as their own group
    val o = offsets.columns.foldLeft(offsets)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
    val cond = (Pid +: keyCols).map(c => sorted(c) <=> o(s"__o_$c")).reduce(_ && _)
    sorted.join(broadcast(o), cond)
      .withColumn(rankCol, row_number().over(wLocal) + col("__o___offset"))
      .withColumn(totalCol, col(s"__o_$totalCol"))
      // o.columns already carry the __o_ prefix — drop them as-is
      .drop(o.columns.toIndexedSeq: _*)
      .drop(Pid)
  }

  /** Adds exact GLOBAL running sum of `valueCol` in `orderCols` order
    * (inclusive of the current row) — `sum() OVER (ORDER BY …)` without
    * the single-partition window Spark plans for a global frame. Same
    * machinery as [[exactRank]]: range-repartition on the order, sum per
    * partition (tiny frame), cumulative offsets broadcast back, local
    * running sum bounded by partition size.
    */
  def exactCumSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      cumCol: String = "cum"): DataFrame = {
    Seq(cumCol, Pid).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val sorted = rangeSortedWithPid(df, orderCols)
    val wOff = Window.orderBy(Pid).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(Pid).agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__offset", coalesce(sum("__psum").over(wOff), lit(0L)))
      .select(col(Pid).as("__o_pid"), col("__offset"))
    val wLocal = Window.partitionBy(Pid).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offsets), sorted(Pid) === offsets("__o_pid"))
      .withColumn(cumCol, sum(col(valueCol)).over(wLocal) + col("__offset"))
      .drop(Pid, "__o_pid", "__offset")
  }

  /** Adds exact GLOBAL EXCLUSIVE running minimum of `valueCol` in
    * `orderCols` order — `min() OVER (ORDER BY … ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` without the single-partition global
    * window. Same machinery as [[exactCumSum]]: per-partition minima are
    * a tiny frame, their exclusive prefix-min by partition id broadcasts
    * back, each row combines its partition offset with the local
    * exclusive running min. First row globally gets NULL (empty prefix).
    * The sweep primitive under skyline / dominance queries.
    */
  def exactRunningMin(df: DataFrame, orderCols: Seq[String], valueCol: String,
      minCol: String = "runmin"): DataFrame = {
    Seq(minCol, Pid).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val sorted = rangeSortedWithPid(df, orderCols)
    val wOff = Window.orderBy(Pid).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(Pid).agg(min(col(valueCol)).as("__pmin"))
      .withColumn("__offset", min("__pmin").over(wOff)) // null for first pid
      .select(col(Pid).as("__o_pid"), col("__offset"))
    val wLocal = Window.partitionBy(Pid).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted.join(broadcast(offsets), sorted(Pid) === offsets("__o_pid"))
      .withColumn("__lmin", min(col(valueCol)).over(wLocal)) // null on 1st row
      .withColumn(minCol,
        when(col("__lmin").isNull, col("__offset"))
          .when(col("__offset").isNull, col("__lmin"))
          .otherwise(least(col("__lmin"), col("__offset"))))
      .drop(Pid, "__o_pid", "__offset", "__lmin")
  }

  /** Adds exact PER-GROUP running sum of `valueCol` (inclusive, in
    * orderCols order within each keyCols group) — `sum() OVER (PARTITION
    * BY k ORDER BY …)` without funneling each key through one reducer.
    * The [[exactRank]] machinery with sums instead of counts: range-
    * repartition on (keys…, order…), per-(partition, key) partial sums
    * (tiny frame), within-key cumulative offsets by partition id,
    * broadcast back, local running sum bounded by partition size at ANY
    * key cardinality.
    */
  def groupedCumSum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, cumCol: String = "cum"): DataFrame = {
    Seq(cumCol, Pid).foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val sorted = rangeSortedWithPid(df, keyCols ++ orderCols)
    val sums = sorted.groupBy((Pid +: keyCols).map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"))
    val wOff = Window.partitionBy(keyCols.map(col): _*).orderBy(Pid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__offset", coalesce(sum("__psum").over(wOff), lit(0L)))
      .select(((Pid +: keyCols).map(col) :+ col("__offset")): _*)
    val o = offsets.columns.foldLeft(offsets)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
    // null-SAFE key join, same reason as exactRank
    val cond = (Pid +: keyCols).map(c => sorted(c) <=> o(s"__o_$c")).reduce(_ && _)
    val wLocal = Window.partitionBy((Pid +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(o), cond)
      .withColumn(cumCol, sum(col(valueCol)).over(wLocal) + col("__o___offset"))
      .drop(o.columns.toIndexedSeq: _*)
      .drop(Pid)
  }

  /** Adds `bucketCol` = SQL-standard NTILE(n) bucket (first N mod n
    * buckets hold ceil(N/n) rows) — a pure function of (rank, N) applied
    * row-locally on top of [[exactRank]].
    */
  def exactNtile(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      n: Int, bucketCol: String = "bucket"): DataFrame = {
    require(!df.columns.contains(bucketCol), s"input already has a column named $bucketCol")
    // internal rank/total names so caller columns can't collide
    val (r, t) = ("__graft_rnk", "__graft_total")
    exactRank(df, keyCols, orderCols, rankCol = r, totalCol = t)
      .withColumn(bucketCol, expr(
        s"""CAST(CASE
           |  WHEN $r <= ($t % $n) * ($t DIV $n + 1)
           |  THEN ($r + $t DIV $n) DIV ($t DIV $n + 1)
           |  ELSE $t % $n
           |    + ($r - ($t % $n) * ($t DIV $n + 1) + greatest(1, $t DIV $n) - 1)
           |      DIV greatest(1, $t DIV $n)
           |END AS INT)""".stripMargin))
      .drop(r, t)
  }

  /** #239 Surrogate-key assignment for a dimension: dense 1..n ids over
    * the natural key, CONTENT-ADDRESSED (ordered by md5 of the natural
    * key) so the same rows get the same surrogates on any rerun, any
    * partitioning, any engine — never `monotonically_increasing_id`
    * (partition-dependent, gap-ridden) and never a single-reducer
    * `row_number() OVER ()`: the rank comes from [[exactRank]]'s
    * range-sort + broadcast offsets.
    */
  def surrogateKeys(dim: DataFrame, naturalKey: String,
      skCol: String = "sk"): DataFrame = {
    val keyed = dim.withColumn("__nk_hash", md5(col(naturalKey).cast("string")))
    exactRank(keyed, Nil, Seq("__nk_hash", naturalKey), rankCol = skCol,
      totalCol = "__n_total")
      .drop("__nk_hash", "__n_total")
      .withColumn(skCol, col(skCol).cast("long"))
  }
}
