package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet loaders for the driver-generated tables at /root/testdata/sf*.
  *
  * Mirrors the reference's TPC-H data model
  * (reference: scripts/setup_tpch_database.py:84-245) plus the CDC stream
  * analog `events` and the LLM-pipeline tables `documents`/`embeddings`.
  *
  * Scale note: plain `spark.read.parquet` keeps the scan pushdown-able
  * (PushedFilters / ReadSchema reach the file source); at 100 TB these
  * tables would be directory-partitioned and the same loaders apply.
  */
object Tables {

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). We read `ts` as the raw INT64
    * (nanoseconds since epoch) and derive microseconds with `ts DIV 1000`,
    * which matches DuckDB's `epoch_us(ts)` truncation exactly — keeping the
    * oracle comparable.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanoseconds since epoch (see above)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
