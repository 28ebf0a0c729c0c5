package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consumer-lag monitoring over the kafkalog transport — the Burrow-style
  * dashboard row a real Debezium deployment watches to know whether the
  * sink is keeping up with the binlog (reference behavior: the demo's
  * monitoring cells chart consumer progress per table;
  * debezium-approach/tests/test_debezium_integration.py:100-151 reads
  * offsets explicitly). Lag is pure SEGMENT METADATA: end offsets come
  * from the segment-name index ([[EmbeddedTopicLog.endOffset]] — no data
  * scan, the same footer-only discipline as the table registry), committed
  * offsets from the consumer's checkpoint contract. At 100 TB of retained
  * log this stays a partitions-sized frame computed in O(segments) file
  * listings.
  */
object KafkaLag {

  /** Per-partition lag frame for one topic: log end offset vs the
    * consumer's committed offset, absolute lag, and lag as basis points
    * of the log. `committed` maps partition → next-offset-to-read
    * (the KafkaLogOffset convention); partitions absent from the map are
    * fully unread (committed 0).
    */
  def consumerLag(spark: SparkSession, root: String, topic: String,
      committed: Map[Int, Long]): DataFrame = {
    val n = EmbeddedTopicLog.partitionCount(root, topic)
    val rows = (0 until n).map { p =>
      val end = EmbeddedTopicLog.endOffset(root, topic, p)
      val c = math.min(committed.getOrElse(p, 0L), end)
      (p.toLong, end, c, end - c)
    }
    import spark.implicits._
    rows.toDF("partition", "end_offset", "committed_offset", "lag")
      .withColumn("lag_bp",
        expr("CASE WHEN end_offset = 0 THEN 0 " +
          "ELSE lag * 10000 DIV end_offset END"))
  }

  /** #379 `cdc_consumer_lag` registered entry: a deterministic 256-record
    * produce (keys "0".."3" land on partitions 0..3 — single-digit keys
    * hash to 48+d, mod 4 = d) into a fresh embedded topic, a consumer
    * committed through 3/4 of each partition, and the lag frame read back
    * from segment metadata. Constant at every SF on purpose: the operator
    * under test is the metadata-only monitor, not the produce; the
    * StreamingSpec drives the REAL consumption loop (lag shrinks to zero
    * as a checkpointed stream drains the topic).
    */
  def lagDemo(spark: SparkSession, dir: String): DataFrame = {
    val rootPath = java.nio.file.Files.createTempDirectory("graft-kafkalag")
    val root = rootPath.toString
    val topic = "orders_cdc"
    val recs = (0 until 256).map(i => ((i % 4).toString, s"""{"i":$i}"""))
    EmbeddedTopicLog.produce(root, topic, recs, partitions = 4)
    val committed = (0 until 4).map { p =>
      p -> EmbeddedTopicLog.endOffset(root, topic, p) * 3 / 4
    }.toMap
    val lag = consumerLag(spark, root, topic, committed)
    // consumerLag materializes the metadata rows eagerly (the frame is a
    // LocalRelation — no lazy file access survives), so the embedded topic
    // is garbage the moment the frame exists: delete it NOW rather than
    // leaking one temp tree per invocation across 352-query sweeps
    deleteRecursively(rootPath)
    lag
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursively(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
