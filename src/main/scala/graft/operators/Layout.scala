package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the Z-ORDER / cluster-by
  * of table formats, expressed with plain Spark primitives: normalize each
  * clustering column to a 16-bit rank, interleave the bits into a Morton
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

  /** Min/max scaling of `c` to a 0..65535 rank given precomputed bounds
    * (robust alternative at extreme skew is a quantile rank, same shape
    * as Events.valueQuartiles).
    */
  private def rank16(c: String, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, 1e-12)
    least(lit(65535), floor((col(c).cast("double") - lit(lo)) / lit(span) * 65536).cast("long"))
  }

  /** Repartition+sort `df` by the Morton key of (cA, cB): `buckets` output
    * partitions, each locally sorted — write this and every partition file
    * carries tight min/max ranges on BOTH columns. Bounds for both
    * dimensions come from ONE pre-pass aggregate, not one scan per column.
    */
  def mortonLayout(df: DataFrame, cA: String, cB: String, buckets: Int): DataFrame = {
    val b = df.agg(
      min(col(cA)).cast("double").as("loA"), max(col(cA)).cast("double").as("hiA"),
      min(col(cB)).cast("double").as("loB"), max(col(cB)).cast("double").as("hiB")).head()
    val keyed = df.withColumn("__m", morton16(
      rank16(cA, b.getDouble(0), b.getDouble(1)),
      rank16(cB, b.getDouble(2), b.getDouble(3))))
    keyed.repartitionByRange(buckets, col("__m"))
      .sortWithinPartitions("__m")
      .drop("__m")
  }
}
