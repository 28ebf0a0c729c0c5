package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Debezium

/** Avro wire format for the Debezium envelope — the ingestion path the
  * reference wires Kafka into (reference: debezium-approach/notebooks/
  * dlt_cdc_pipeline.py:107-135 reads the topic and deserializes the value
  * into the envelope before the silver parse).
  *
  * The sandbox has no spark-avro module jar and no broker, so the
  * encode/decode is built directly on Avro core (`GenericDatumWriter` /
  * `GenericDatumReader` over the binary encoding — the same byte format
  * `from_avro`/`to_avro` produce for a non-union top-level record). The
  * Avro schema is DERIVED from [[Debezium.envelopeSchema]] so the two
  * ingestion paths (JSON text, Avro binary) can never drift apart.
  *
  * Scale shape: both directions are `mapPartitions` with the encoder,
  * writer, and output buffer REUSED across every row of a partition
  * (Avro's factory API is designed for exactly this); no shuffle, no
  * driver involvement, arbitrary parallelism. This is the same
  * per-partition-amortized pattern spark-avro's own AvroSerializer uses.
  */
object AvroEnvelope extends Serializable {

  /** Avro record schema mirroring the Spark envelope struct 1:1 (field
    * order included). Every field is a `[null, T]` union — same
    * nullability as the Spark schema.
    */
  val avroSchema: Schema = toAvroRecord(Debezium.envelopeSchema, "envelope")

  /** Public derivation seam for OTHER generations of the envelope (the
    * [[SchemaRegistry]] path): same struct→Avro mapping, caller-chosen
    * struct. Record names derive from `name` the same way, so Avro schema
    * resolution between generations sees matching record identities.
    */
  def avroSchemaFor(st: StructType, name: String = "envelope"): Schema =
    toAvroRecord(st, name)

  private def toAvroRecord(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case nested: StructType => toAvroRecord(nested, s"${name}_${f.name}")
        case LongType           => Schema.create(Schema.Type.LONG)
        case IntegerType        => Schema.create(Schema.Type.INT)
        case StringType         => Schema.create(Schema.Type.STRING)
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
      val union = Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.cdc", false, fields.toList.asJava)
  }

  /** Unwrap our `[null, T]` unions to T. */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Per-partition conversion plan: field positions, unwrapped union
    * schemas and nesting resolved ONCE instead of per row. The naive
    * per-row walk (`getFields.asScala` + a union scan per field) allocated
    * a wrapper and a closure per field per row — ~25 fields deep for the
    * envelope, measured ~20% of the encode stage at sf0.1.
    */
  private final class FieldPlan(val pos: Int, val nested: RecordPlan,
      val isString: Boolean)
  private final class RecordPlan(val schema: Schema) {
    val fields: Array[FieldPlan] = schema.getFields.asScala.toArray.map { f =>
      val fs = nonNull(f.schema())
      new FieldPlan(f.pos(),
        if (fs.getType == Schema.Type.RECORD) new RecordPlan(fs) else null,
        fs.getType == Schema.Type.STRING)
    }
  }

  private def rowToRecord(row: Row, plan: RecordPlan): GenericRecord = {
    val rec = new GenericData.Record(plan.schema)
    var i = 0
    while (i < plan.fields.length) {
      val fp = plan.fields(i)
      if (!row.isNullAt(fp.pos)) {
        val v = row.get(fp.pos)
        rec.put(fp.pos,
          if (fp.nested != null) rowToRecord(v.asInstanceOf[Row], fp.nested)
          else v)
      }
      i += 1
    }
    rec
  }

  private def recordToRow(rec: GenericRecord, plan: RecordPlan): Row = {
    val arr = new Array[Any](plan.fields.length)
    var i = 0
    while (i < plan.fields.length) {
      val fp = plan.fields(i)
      arr(i) = rec.get(fp.pos) match {
        case null                  => null
        case nested: GenericRecord => recordToRow(nested, fp.nested)
        case s if fp.isString      => s.toString
        case prim                  => prim
      }
      i += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
  }

  private val encodedSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("avro_bytes", BinaryType)))

  /** Envelope JSON text column → Avro binary column (event_id, avro_bytes).
    * The JSON is parsed once (codegen'd `from_json`), then each partition
    * serializes with one reused writer/encoder/buffer.
    */
  def encode(df: DataFrame, eventCol: String, idCol: String = "event_id"): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("event_id"),
      from_json(col(eventCol), Debezium.envelopeSchema).as("parsed"))
    val schemaJson = avroSchema.toString // Schema itself is not serializable-stable; ship text
    in.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val plan = new RecordPlan(schema)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new ByteArrayOutputStream(1024)
      var enc: BinaryEncoder = null
      it.map { r =>
        baos.reset()
        enc = EncoderFactory.get().binaryEncoder(baos, enc)
        writer.write(rowToRecord(r.getStruct(1), plan), enc)
        enc.flush()
        Row(r.getLong(0), baos.toByteArray)
      }
    }(Encoders.row(encodedSchema))
  }

  private val decodedSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("parsed", Debezium.envelopeSchema)))

  /** Avro binary column → parsed envelope struct (`parsed`), ready for
    * [[Debezium.extractFields]]. One reused reader/decoder per partition.
    */
  def decode(df: DataFrame, bytesCol: String, idCol: String = "event_id"): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("event_id"), col(bytesCol).as("b"))
    val schemaJson = avroSchema.toString
    in.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val plan = new RecordPlan(schema)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var dec: BinaryDecoder = null
      var rec: GenericRecord = null
      it.map { r =>
        dec = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](1), dec)
        rec = reader.read(rec, dec)
        Row(r.getLong(0), recordToRow(rec, plan))
      }
    }(Encoders.row(decodedSchema))
  }

  /** Avro-path silver parse: decode + the SAME field extraction as the
    * JSON path — so `cdc_avro_parse` is byte-parity comparable with
    * `cdc_debezium_parse` and shares its DuckDB oracle.
    */
  def parseAvro(df: DataFrame, bytesCol: String, idCol: String = "event_id"): DataFrame =
    Debezium.extractFields(decode(df, bytesCol, idCol))

  /** The envelope fields [[Debezium.extractFields]] actually reads —
    * the reader-schema side of the pruned decode. Same field names as
    * [[Debezium.envelopeSchema]] so Avro schema resolution (reader ⊂
    * writer, matched by name) skips everything else AT THE DECODER:
    * version/connector/server_id/row/thread/query/total_order/... are
    * skipped as bytes, never allocated as JVM strings.
    */
  private val silverEnvelopeStruct = StructType(Seq(
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", StructType(Seq(
      StructField("ts_ms", LongType),
      StructField("snapshot", StringType),
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("gtid", StringType),
      StructField("file", StringType),
      StructField("pos", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("transaction", StructType(Seq(
      StructField("id", StringType))))))

  private val silverFlatSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("cdc_operation_raw", StringType),
    StructField("before_image", StringType),
    StructField("after_image", StringType),
    StructField("database_name", StringType),
    StructField("table_name", StringType),
    StructField("source_ts_ms", LongType),
    StructField("snapshot_flag", StringType),
    StructField("binlog_file", StringType),
    StructField("binlog_position", LongType),
    StructField("gtid", StringType),
    StructField("transaction_id", StringType),
    StructField("event_ts_ms", LongType)))

  /** Column-pruned fused decode: Avro binary → the exact flat columns
    * [[Debezium.extractFields]] emits, in one object pass. Why it exists:
    * a `mapPartitions` is opaque to Catalyst, so the composed
    * `decode → extractFields` pays (a) full-envelope allocation at the
    * Avro reader, (b) a nested-struct RowEncoder conversion, and (c) a
    * projection Catalyst cannot push back through the object boundary.
    * This decoder does the pruning manually — the reader schema drops
    * unread fields inside Avro's skip path, and the emitted row is
    * already flat. At 100 TB this is the difference between shipping
    * 20 decoded columns per event through two conversion layers and
    * shipping 12 through one. AvroEnvelopeSpec pins bit-parity against
    * the composed path on every operation arm.
    */
  def decodeSilver(df: DataFrame, bytesCol: String, idCol: String = "event_id"): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("event_id"), col(bytesCol).as("b"))
    val writerJson = avroSchema.toString
    val readerJson = toAvroRecord(silverEnvelopeStruct, "envelope").toString
    in.mapPartitions { it =>
      val writerSch = new Schema.Parser().parse(writerJson)
      val readerSch = new Schema.Parser().parse(readerJson)
      val reader = new GenericDatumReader[GenericRecord](writerSch, readerSch)
      val pBefore = readerSch.getField("before").pos()
      val pAfter = readerSch.getField("after").pos()
      val pSource = readerSch.getField("source").pos()
      val pOp = readerSch.getField("op").pos()
      val pTsMs = readerSch.getField("ts_ms").pos()
      val pTxn = readerSch.getField("transaction").pos()
      val srcSch = nonNull(readerSch.getField("source").schema())
      val pSrcTs = srcSch.getField("ts_ms").pos()
      val pSnap = srcSch.getField("snapshot").pos()
      val pDb = srcSch.getField("db").pos()
      val pTable = srcSch.getField("table").pos()
      val pGtid = srcSch.getField("gtid").pos()
      val pFile = srcSch.getField("file").pos()
      val pPos = srcSch.getField("pos").pos()
      val txnSch = nonNull(readerSch.getField("transaction").schema())
      val pTxnId = txnSch.getField("id").pos()
      var dec: BinaryDecoder = null
      var rec: GenericRecord = null
      def str(v: AnyRef): String = if (v == null) null else v.toString
      it.map { r =>
        dec = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](1), dec)
        rec = reader.read(rec, dec)
        val src = rec.get(pSource).asInstanceOf[GenericRecord]
        val txn = rec.get(pTxn).asInstanceOf[GenericRecord]
        Row(r.getLong(0),
          str(rec.get(pOp)),
          str(rec.get(pBefore)),
          str(rec.get(pAfter)),
          if (src == null) null else str(src.get(pDb)),
          if (src == null) null else str(src.get(pTable)),
          if (src == null) null else src.get(pSrcTs),
          if (src == null) null else str(src.get(pSnap)),
          if (src == null) null else str(src.get(pFile)),
          if (src == null) null else src.get(pPos),
          if (src == null) null else str(src.get(pGtid)),
          if (txn == null) null else str(txn.get(pTxnId)),
          rec.get(pTsMs))
      }
    }(Encoders.row(silverFlatSchema))
  }

  /** #175 Registered query: synth envelope → Avro binary → pruned fused
    * decode → silver projection (identical output to
    * [[Debezium.silverParsed]], proving the Avro wire round-trip loses
    * nothing the silver layer reads). Uses [[decodeSilver]] — the
    * composed `parseAvro` is bit-identical (AvroEnvelopeSpec) but pays
    * an extra RowEncoder boundary a scale deployment wouldn't.
    */
  def avroSilverParsed(spark: SparkSession, dir: String): DataFrame = {
    val env = Debezium.synthEnvelope(spark, dir)
    decodeSilver(encode(env, "cdc_event"), "avro_bytes")
      .withColumn("operation", Debezium.readableOp(col("cdc_operation_raw")))
      .withColumn("after_user_id",
        get_json_object(col("after_image"), "$.user_id").cast("long"))
      .select("event_id", "cdc_operation_raw", "operation", "before_image",
        "after_image", "after_user_id", "database_name", "table_name",
        "source_ts_ms", "snapshot_flag", "binlog_file", "binlog_position",
        "gtid", "transaction_id", "event_ts_ms")
  }

  /** Source-agnostic envelope stream: one config seam where Kafka drops
    * in (reference: dlt_cdc_pipeline.py:107-135). Every arm yields a
    * streaming frame with a single `cdc_event` string column feeding
    * [[Debezium.parseEnvelope]]:
    *
    *  - `"kafka"`  — `readStream.format("kafka")` + `value` cast. With a
    *    real broker this needs the spark-sql-kafka package on the cluster
    *    classpath; `kafka.bootstrap.servers = embedded://<root>` instead
    *    routes through [[KafkaLogSource]], the file-backed topic log with
    *    the Kafka source's exact schema and offset contract — the SAME
    *    value-cast arm runs against both, and StreamingSpec drives the
    *    embedded one end-to-end (produce → offsets → silver → gold with
    *    checkpoint restart).
    *  - `"text"`   — newline-delimited envelope files (what the specs and
    *    the file-based demo pipeline use).
    *  - `"parquet"`— envelope column in parquet files; pass
    *    `eventColumn` in options if it is not `cdc_event`.
    */
  def readEnvelopeStream(spark: SparkSession, format: String,
      options: Map[String, String]): DataFrame = format match {
    case "kafka" =>
      val bootstrap = options.getOrElse("kafka.bootstrap.servers", "")
      val reader =
        if (bootstrap.startsWith("embedded://"))
          spark.readStream.format("kafkalog")
            .option("path", bootstrap.stripPrefix("embedded://"))
            .option("topic", options.getOrElse("subscribe",
              sys.error("kafka arm: 'subscribe' option required")))
            .option("startingOffsets",
              options.getOrElse("startingOffsets", "earliest"))
            .load()
        else spark.readStream.format("kafka").options(options).load()
      reader.selectExpr("CAST(value AS STRING) AS cdc_event")
    case "text" =>
      spark.readStream.format("text").options(options - "path")
        .load(options("path"))
        .select(col("value").as("cdc_event"))
    case "parquet" =>
      val c = options.getOrElse("eventColumn", "cdc_event")
      spark.readStream.format("parquet").options(options - "path" - "eventColumn")
        .load(options("path"))
        .select(col(c).as("cdc_event"))
    case other =>
      throw new IllegalArgumentException(s"unsupported envelope source '$other'")
  }
}
