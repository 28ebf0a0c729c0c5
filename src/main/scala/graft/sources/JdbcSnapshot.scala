package graft.sources

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned JDBC snapshot loader — the initial-load / backfill path of
  * a CDC pipeline (reference: src/aurora_cdc/connection_pool_v2.py:26-140
  * pooled parallel readers; unity_catalog_cdc_demo.py:218-269 initial
  * snapshot). Re-expressed Spark-first: `spark.read.jdbc` with
  * partitionColumn/lowerBound/upperBound/numPartitions issues
  * `numPartitions` range-predicate queries in parallel — Spark's executor
  * pool IS the connection pool, one connection per task, and the ranges
  * are non-overlapping so the snapshot is exactly-once by construction.
  *
  * At 100 TB (a 500-table initial load) the parallelism knob is per-table
  * `numPartitions` × concurrent tables; the key-range split keeps each
  * query index-backed on the source side instead of a full scan per
  * reader.
  */
object JdbcSnapshot {

  /** Min/max of the partition column via one tiny driver-side query (the
    * reference computes the same bounds before splitting,
    * unity_catalog_cdc_demo.py:232-238).
    */
  def keyBounds(url: String, table: String, partitionCol: String,
      props: Properties = new Properties): (Long, Long) = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MIN($partitionCol), MAX($partitionCol) FROM $table")
      rs.next()
      (rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }

  /** Partitioned parallel snapshot read: `numPartitions` non-overlapping
    * range queries over `partitionCol` (bounds auto-discovered when not
    * supplied).
    */
  def snapshot(spark: SparkSession, url: String, table: String,
      partitionCol: String, numPartitions: Int,
      bounds: Option[(Long, Long)] = None,
      props: Properties = new Properties): DataFrame = {
    val (lo, hi) = bounds.getOrElse(keyBounds(url, table, partitionCol, props))
    spark.read.jdbc(url, table, partitionCol, lo, hi, numPartitions, props)
  }

  /** Snapshot rows → the unified CDC envelope: every row is a SNAPSHOT
    * read (Debezium op 'r'), sequenced by the key so a downstream merge
    * treats the initial load exactly like replayed changes
    * (dlt_cdc_pipeline.py:190-197 maps 'r' the same way).
    */
  def asCdcEnvelope(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("operation", lit("SNAPSHOT"))
      .withColumn("cdc_operation_raw", lit("r"))
      .withColumn("seq_key", col(keyCol).cast("long"))

  /** #92 Registered query: events → embedded Derby → partitioned snapshot
    * back out, reporting per-JDBC-partition ranges (proves the parallel
    * range split) plus envelope totals. Derby stands in for the MySQL/
    * Aurora endpoint — same JDBC surface Spark would hit in production.
    */
  def snapshotStats(spark: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:graftsnap;create=true"
    val props = new Properties
    // load the source table (executor-side batched inserts via the stock
    // JDBC writer; local-mode Derby is in-process)
    // deterministic bounded slice: keeps the embedded-DB load fixed-cost
    // across scale factors (the operator under test is the partitioned
    // READ; production initial loads read FROM the database)
    val src = graft.Tables.events(spark, dir)
      .filter(col("event_id") <= 20000)
      .select("event_id", "user_id", "event_type", "value")
    val conn = DriverManager.getConnection(url, props)
    try {
      try conn.createStatement().execute("DROP TABLE events_snap")
      catch { case _: java.sql.SQLException => () } // first run: no table
    } finally conn.close()
    src.write.mode("append").jdbc(url, "events_snap", props)

    // quoted: the JDBC writer created case-sensitive lowercase columns,
    // which an unquoted identifier would case-fold past
    val snap = snapshot(spark, url, "events_snap", "\"event_id\"", numPartitions = 4)
    asCdcEnvelope(snap, "event_id")
      .groupBy(spark_partition_id().as("jdbc_partition"))
      .agg(count(lit(1)).as("n_rows"),
        min("event_id").as("min_id"), max("event_id").as("max_id"),
        first("operation").as("operation"))
  }
}
