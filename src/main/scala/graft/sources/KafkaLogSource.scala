package graft.sources

import java.io.{DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `kafkalog` — a file-backed topic log with the Kafka SOURCE surface.
  *
  * The reference's Debezium stack is Kafka-first (reference:
  * debezium-approach/docker/docker-compose.yml — broker + connect;
  * tests/test_debezium_integration.py:100-151 registers the topic and
  * consumes it). This sandbox has no broker and no spark-sql-kafka jar,
  * so the Kafka ingestion arm would otherwise stay config-only. This
  * source closes that gap the honest way: an embedded, broker-less topic
  * log whose READ side mirrors the Kafka source contract exactly —
  *
  *  - the output schema is the Kafka source's, column for column:
  *    (key BINARY, value BINARY, topic STRING, partition INT,
  *    offset LONG, timestamp TIMESTAMP, timestampType INT) — so every
  *    downstream transform written against real Kafka (`CAST(value AS
  *    STRING)`, offset book-keeping, partition-aware consumers) runs
  *    unchanged;
  *  - offsets are per-(topic)partition monotonically increasing longs,
  *    checkpointed as JSON; `startingOffsets` accepts earliest/latest;
  *  - micro-batch planning reads each partition's segment files for
  *    exactly [start, end) — replaying a checkpoint re-delivers exactly
  *    the same rows, so exactly-once composes with foreachBatch sinks
  *    the same way it does against a broker.
  *
  * The WRITE side ([[EmbeddedTopicLog.produce]]) is the stand-in for the
  * producer/Connect half: append-only binary segment files per
  * partition, one atomic rename per produce batch, offsets assigned
  * key-hash (sticky partition per key — Kafka's ordering contract) or
  * round-robin for null keys.
  *
  * Scale notes: this is a test/demo transport, not a broker replacement —
  * but the read path is still partition-parallel (one task per topic
  * partition per micro-batch) and segment files are ranged by filename,
  * so a batch touches only the segments overlapping its offset window.
  */
object EmbeddedTopicLog {

  private def partDir(root: String, topic: String, p: Int): Path =
    Paths.get(root, topic, s"p=$p")

  /** Segment filename carries its offset range: seg-<start>-<endExcl>. */
  private val SegName = "seg-(\\d+)-(\\d+)\\.bin".r

  // Files.list returns a Stream backed by an open directory handle; every
  // micro-batch lists each partition dir, so the handle must be closed
  // eagerly (not left to GC) or a long-running stream leaks descriptors
  private def listDir[A](d: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(d)
    try f(s.iterator().asScala) finally s.close()
  }

  private[sources] def segments(root: String, topic: String, p: Int): Seq[(Long, Long, Path)] = {
    val d = partDir(root, topic, p)
    if (!Files.isDirectory(d)) Nil
    else listDir(d)(_.toSeq).flatMap { f =>
      f.getFileName.toString match {
        case SegName(s, e) => Some((s.toLong, e.toLong, f))
        case _             => None
      }
    }.sortBy(_._1)
  }

  def partitionCount(root: String, topic: String): Int = {
    val d = Paths.get(root, topic)
    if (!Files.isDirectory(d)) 0
    else listDir(d)(_.count(_.getFileName.toString.startsWith("p=")))
  }

  /** Next offset to be assigned in a partition (== current end offset). */
  def endOffset(root: String, topic: String, p: Int): Long =
    segments(root, topic, p).lastOption.map(_._2).getOrElse(0L)

  /** Append one produce batch. Records are (key, value); partition =
    * hash(key) mod partitions for keyed records (per-key ordering, as
    * Kafka's default partitioner), round-robin otherwise. Returns the
    * number of records written. One atomic segment rename per touched
    * partition — a reader never observes a half-written segment.
    */
  def produce(root: String, topic: String, records: Seq[(String, String)],
      partitions: Int, tsMs: Long = 0L): Long = {
    require(partitions > 0, "partitions must be positive")
    val byPart = records.zipWithIndex.groupBy { case ((key, _), i) =>
      if (key == null) i % partitions
      else math.floorMod(key.hashCode, partitions)
    }
    // touch every partition dir so partitionCount is stable from batch 1
    (0 until partitions).foreach(p => Files.createDirectories(partDir(root, topic, p)))
    byPart.foreach { case (p, recs) =>
      val dir = partDir(root, topic, p)
      val start = endOffset(root, topic, p)
      val end = start + recs.length
      val tmp = dir.resolve(s".seg-$start-$end.tmp")
      val out = new DataOutputStream(new FileOutputStream(tmp.toFile))
      try {
        out.writeInt(recs.length)
        recs.zipWithIndex.foreach { case (((key, value), _), i) =>
          out.writeLong(start + i)
          out.writeLong(tsMs)
          val kb = if (key == null) null else key.getBytes("UTF-8")
          out.writeInt(if (kb == null) -1 else kb.length)
          if (kb != null) out.write(kb)
          val vb = value.getBytes("UTF-8")
          out.writeInt(vb.length)
          out.write(vb)
        }
      } finally out.close()
      Files.move(tmp, dir.resolve(s"seg-$start-$end.bin"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    records.length.toLong
  }

  private[sources] def readSegment(f: Path): Iterator[(Long, Long, Array[Byte], Array[Byte])] = {
    val in = new DataInputStream(new FileInputStream(f.toFile))
    val n = in.readInt()
    val buf = (0 until n).map { _ =>
      val off = in.readLong()
      val ts = in.readLong()
      val kl = in.readInt()
      val kb = if (kl < 0) null else { val a = new Array[Byte](kl); in.readFully(a); a }
      val vl = in.readInt()
      val vb = { val a = new Array[Byte](vl); in.readFully(a); a }
      (off, ts, kb, vb)
    }
    in.close()
    buf.iterator
  }
}

class KafkaLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafkalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaLogTable(properties.asScala.toMap)
}

object KafkaLog {
  /** The Kafka source's output schema, column for column. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

class KafkaLogTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"kafkalog(${props.getOrElse("topic", "?")})"
  override def schema(): StructType = KafkaLog.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    () => new KafkaLogScan(merged)
  }
}

class KafkaLogScan(options: Map[String, String]) extends Scan {
  private val root = options.getOrElse("path",
    sys.error("kafkalog: 'path' option required"))
  private val topic = options.getOrElse("topic",
    sys.error("kafkalog: 'topic' option required"))
  private val starting = options.getOrElse("startingoffsets",
    options.getOrElse("startingOffsets", "earliest"))

  override def readSchema(): StructType = KafkaLog.schema
  override def description(): String = s"kafkalog(topic=$topic)"

  private def endOffsets: Map[Int, Long] = {
    val n = EmbeddedTopicLog.partitionCount(root, topic)
    (0 until n).map(p => p -> EmbeddedTopicLog.endOffset(root, topic, p)).toMap
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      endOffsets.toSeq.sortBy(_._1).map { case (p, end) =>
        KafkaLogPartition(root, topic, p, 0L, end): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      KafkaLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaLogMicroBatchStream(root, topic, starting)
}

/** Offset = per-partition next-offset map, JSON like the Kafka source's
  * {"topic":{"0":5,"1":7}} (flattened — one topic per scan).
  */
case class KafkaLogOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }.mkString("{", ", ", "}")
}

object KafkaLogOffset {
  def parse(json: String): KafkaLogOffset =
    KafkaLogOffset("\"(\\d+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

class KafkaLogMicroBatchStream(root: String, topic: String, starting: String)
    extends MicroBatchStream {

  private def endOffsets: Map[Int, Long] = {
    val n = EmbeddedTopicLog.partitionCount(root, topic)
    (0 until n).map(p => p -> EmbeddedTopicLog.endOffset(root, topic, p)).toMap
  }

  override def initialOffset(): Offset = starting match {
    case "latest" => KafkaLogOffset(endOffsets)
    case _        => KafkaLogOffset(endOffsets.map { case (p, _) => p -> 0L })
  }

  override def latestOffset(): Offset = KafkaLogOffset(endOffsets)

  override def deserializeOffset(json: String): Offset = KafkaLogOffset.parse(json)
  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaLogOffset].offsets
    val e = end.asInstanceOf[KafkaLogOffset].offsets
    e.toSeq.sortBy(_._1).flatMap { case (p, eo) =>
      val so = s.getOrElse(p, 0L)
      if (so < eo) Some(KafkaLogPartition(root, topic, p, so, eo): InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = KafkaLogReaderFactory
  override def stop(): Unit = ()
}

case class KafkaLogPartition(root: String, topic: String, p: Int,
    start: Long, end: Long) extends InputPartition

object KafkaLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val kp = partition.asInstanceOf[KafkaLogPartition]
    // only segments overlapping [start, end): ranged by filename, so a
    // micro-batch never opens historical segments it already consumed
    val rows = EmbeddedTopicLog.segments(kp.root, kp.topic, kp.p)
      .filter { case (s, e, _) => e > kp.start && s < kp.end }
      .iterator
      .flatMap { case (_, _, f) => EmbeddedTopicLog.readSegment(f) }
      .filter { case (off, _, _, _) => off >= kp.start && off < kp.end }
    new PartitionReader[InternalRow] {
      private val it = rows
      private var cur: (Long, Long, Array[Byte], Array[Byte]) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow(
        cur._3, cur._4, UTF8String.fromString(kp.topic), kp.p, cur._1,
        cur._2 * 1000L /* ms → µs */, 0 /* CreateTime */)
      override def close(): Unit = ()
    }
  }
}
