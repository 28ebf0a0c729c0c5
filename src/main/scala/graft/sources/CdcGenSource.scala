package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** `cdcgen` — a DataSource V2 that deterministically synthesizes the CDC
  * event envelope. The Spark-native analog of the reference's custom CDC
  * DataSource + workload generator (reference:
  * src/aurora_cdc/datasource/aurora_cdc_datasource_v2.py — offset
  * management, partitioned parallel reads, streaming micro-batches;
  * scripts/cdc_data_generator.py — the synthetic change workload).
  *
  * Batch:     spark.read.format("cdcgen").option("rows", n)
  *              .option("partitions", p).load()
  * Streaming: spark.readStream.format("cdcgen")
  *              .option("rowsPerBatch", n).option("maxRows", m).load()
  *
  * Scale design: rows are generated partition-locally from (seed, event_id)
  * — no driver-side materialization, arbitrary parallelism, and the
  * streaming offset is a plain row counter so checkpoint/restart gives
  * exactly-once delivery (the role binlog file/position pairs play in the
  * reference, aurora_cdc_datasource_v2.py:248-308).
  */
class CdcGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdcgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdcGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcGenTable(properties.asScala.toMap)
}

object CdcGen {
  /** Same shape as Tables.eventsSchema: ts carried as epoch nanos. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)
  ))

  val eventTypes: Array[String] = Array("signup", "click", "view", "purchase", "error")

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic event for (seed, id): same tuple on every executor. */
  def row(seed: Long, id: Long, baseTsNs: Long, users: Int): InternalRow = {
    val h = mix(seed ^ mix(id))
    val tsNs = baseTsNs + id * 1000000000L + math.floorMod(h, 999999999L)
    val user = math.floorMod(mix(h ^ 0x5f5f5f5fL), users.toLong)
    val et = eventTypes(math.floorMod(mix(h ^ 0xa5a5a5a5L), eventTypes.length.toLong).toInt)
    val value = math.floorMod(mix(h ^ 0x3c3c3c3cL), 49000L) / 100.0 + 0.01
    val k = math.floorMod(mix(h ^ 0x77777777L), 100L)
    InternalRow(id, tsNs, user, UTF8String.fromString(et), value,
      UTF8String.fromString(s"""{"k": $k}"""))
  }
}

class CdcGenTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "cdcgen"
  override def schema(): StructType = CdcGen.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    () => new CdcGenScan(merged)
  }
}

class CdcGenScan(options: Map[String, String]) extends Scan {
  private def opt(key: String, default: Long): Long =
    options.get(key).map(_.toLong).getOrElse(default)

  private val rows = opt("rows", 1000L)
  private val partitions = opt("partitions", 4L).toInt
  private val seed = opt("seed", 42L)
  private val users = opt("users", 150L).toInt
  private val baseTsNs = opt("basetsns", 1704067200L * 1000000000L)
  private val rowsPerBatch = opt("rowsperbatch", 100L)
  private val maxRows = opt("maxrows", Long.MaxValue)

  override def readSchema(): StructType = CdcGen.schema
  override def description(): String = s"cdcgen(rows=$rows, partitions=$partitions)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val per = (rows + partitions - 1) / partitions
      (0 until partitions).map { p =>
        val start = p * per
        CdcGenPartition(start, math.min(start + per, rows), seed, baseTsNs, users)
          .asInstanceOf[InputPartition]
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = CdcGenReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcGenMicroBatchStream(rowsPerBatch, maxRows, partitions, seed, baseTsNs, users)
}

case class CdcGenPartition(start: Long, end: Long, seed: Long, baseTsNs: Long, users: Int)
  extends InputPartition

object CdcGenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = CdcGen.row(p.seed, i, p.baseTsNs, p.users)
      override def close(): Unit = ()
    }
  }
}

/** Offset = count of rows emitted so far (the binlog-position analog). */
case class CdcGenOffset(count: Long) extends Offset {
  override def json(): String = s"""{"count": $count}"""
}

class CdcGenMicroBatchStream(rowsPerBatch: Long, maxRows: Long, partitions: Int,
    seed: Long, baseTsNs: Long, users: Int)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  override def initialOffset(): Offset = CdcGenOffset(0L)

  /** SupportsAdmissionControl: the engine hands us the true start offset —
    * essential on checkpoint restart, where the bare latestOffset() has no
    * way to know where the previous run stopped and would plan backwards
    * (re-delivering rows).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdcGenOffset].count
    CdcGenOffset(math.min(s + rowsPerBatch, maxRows))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is used")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    CdcGenOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))
  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcGenOffset].count
    val e = end.asInstanceOf[CdcGenOffset].count
    val total = e - s
    if (total <= 0) return Array.empty
    val per = (total + partitions - 1) / partitions
    (0 until partitions).flatMap { p =>
      val ps = s + p * per
      val pe = math.min(ps + per, e)
      if (ps < pe) Some(CdcGenPartition(ps, pe, seed, baseTsNs, users): InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcGenReaderFactory
  override def stop(): Unit = ()
}
