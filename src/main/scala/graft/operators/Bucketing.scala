package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle once at write time, join forever
  * without exchanges.
  *
  * At 100 TB the orders⋈lineitem join is the recurring cost; bucketing
  * both tables on the join key at ingestion (the reference's initial load,
  * notebooks/demo/unity_catalog_cdc_demo.py:218-269, is the natural place)
  * removes the shuffle from every subsequent join — each task zips
  * bucket i with bucket i.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table on `key` (sorted within
    * buckets, so joins are also sort-free).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — planner produces a
    * SortMergeJoin with NO Exchange on either side when bucket counts
    * match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
