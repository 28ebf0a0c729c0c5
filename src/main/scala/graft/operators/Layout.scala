package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the Z-ORDER / cluster-by
  * of table formats, expressed with plain Spark primitives: normalize each
  * clustering column to a bounded rank, interleave the bits into a Morton
  * key (pure codegen'd bit arithmetic), then range-repartition + sort by
  * that key. Files then hold rows that are close in EVERY clustering
  * dimension, so parquet min/max row-group stats prune multi-predicate
  * scans that a single-column sort cannot — at 100 TB this is the
  * difference between reading one file and reading the table when
  * filtering on (user, time) together.
  */
object Layout {

  /** 16-bit × 16-bit Morton (bit-interleave) key. Inputs must already be
    * 0..65535 ranks; the key is codegen'd shift/or arithmetic, no UDF.
    */
  def morton16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i))
        .cast("long")
    }.reduce(_ + _)

  /** Rank of `c` against precomputed SAMPLED QUANTILE boundaries: the
    * number of boundaries ≤ the value (codegen'd array-lambda scan over a
    * literal boundary array — a few hundred comparisons per row, paid once
    * at layout-write time). Quantile ranks are skew-proof where min/max
    * scaling is not: one 10⁹ outlier in a 0..10³ column collapses a
    * min/max rank to a single bucket, while quantile boundaries still
    * spread the mass evenly (equal row share per rank by construction).
    * Nulls rank 0 (null comparisons drop every boundary).
    */
  private def quantileRank(c: String, boundaries: Array[Double]): Column =
    size(filter(typedLit(boundaries.toSeq),
      x => col(c).cast("double") >= x)).cast("long")

  /** Repartition+sort `df` by the Morton key of (cA, cB): `buckets` output
    * partitions, each locally sorted — write this and every partition file
    * carries tight min/max ranges on BOTH columns.
    *
    * Ranks are sampled-quantile (default 256 buckets per dimension — 8
    * Morton bits each, ample when output partitions ≤ 256²); the
    * boundaries for BOTH columns come from ONE `approxQuantile` pass, not
    * one scan per column.
    */
  def mortonLayout(df: DataFrame, cA: String, cB: String, buckets: Int,
      rankBuckets: Int = 256): DataFrame = {
    val probs = (1 until rankBuckets).map(_.toDouble / rankBuckets).toArray
    val quantiles = df.stat.approxQuantile(Array(cA, cB), probs, 0.001)
    // heavy repetition can duplicate a boundary value across quantiles;
    // ranks only need the distinct cut points
    val bA = quantiles(0).distinct.sorted
    val bB = quantiles(1).distinct.sorted
    val keyed = df.withColumn("__m",
      morton16(quantileRank(cA, bA), quantileRank(cB, bB)))
    keyed.repartitionByRange(buckets, col("__m"))
      .sortWithinPartitions("__m")
      .drop("__m")
  }
}
