package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The cdcgen DataSource V2: batch determinism, partitioning, streaming
  * offsets (SURVEY §2 #48).
  */
class SourceSpec extends SparkSpec {

  test("batch read: row count, schema, determinism across partitionings") {
    val a = spark.read.format("cdcgen")
      .option("rows", 1000).option("partitions", 4).load()
    assert(a.count() == 1000)
    assert(a.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val b = spark.read.format("cdcgen")
      .option("rows", 1000).option("partitions", 13).load()
    // same seed -> identical rows regardless of partition count
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(a.select("event_id").distinct().count() == 1000)
    assert(a.rdd.getNumPartitions == 4)
  }

  test("batch read flows into the CDC pipeline transforms") {
    val df = spark.read.format("cdcgen").option("rows", 500).load()
    val normalized = graft.streaming.CdcStreams.normalize(df)
    assert(normalized.filter(col("operation").isin("INSERT", "UPDATE", "DELETE")).count() == 500)
  }

  test("stream restart from checkpoint resumes at the committed offset") {
    val ckpt = java.nio.file.Files.createTempDirectory("cdcgen_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cdcgen_out").toString
    // file sink (memory sink cannot recover from a checkpoint)
    def run(maxRows: Int, waitFor: Long): Long = {
      val stream = spark.readStream.format("cdcgen")
        .option("rowsPerBatch", 50).option("maxRows", maxRows).load()
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(10))
        .start()
      try {
        def n() = try spark.read.parquet(out).count() catch { case _: Exception => 0L }
        val deadline = System.currentTimeMillis() + 30000
        while (n() < waitFor && System.currentTimeMillis() < deadline) Thread.sleep(200)
        n()
      } finally q.stop()
    }
    assert(run(100, 100) == 100)
    // restart with a higher cap: the resumed stream must deliver only rows
    // beyond the checkpointed offset, exactly once, no duplicates
    assert(run(200, 200) == 200)
    val df = spark.read.parquet(out)
    assert(df.select("event_id").distinct().count() == 200)
  }

  test("micro-batch stream delivers rows incrementally with offset tracking") {
    val stream = spark.readStream.format("cdcgen")
      .option("rowsPerBatch", 100).option("maxRows", 250).load()
    val q = stream.writeStream.format("memory").queryName("cdcgen_sink")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(10))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("cdcgen_sink").count() < 250 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
      }
      val n = spark.table("cdcgen_sink").count()
      assert(n == 250, s"expected 250 rows from capped stream, got $n")
      // exactly-once: no duplicate event ids across micro-batches
      assert(spark.table("cdcgen_sink").select("event_id").distinct().count() == 250)
    } finally q.stop()
  }
}
