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

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      val v = if (row.isNullAt(f.pos())) null else row.get(f.pos())
      val fs = nonNull(f.schema())
      rec.put(f.pos(), v match {
        case null          => null
        case nested: Row   => rowToRecord(nested, fs)
        case prim          => prim
      })
    }
    rec
  }

  private def recordToRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map { f =>
      val fs = nonNull(f.schema())
      rec.get(f.pos()) match {
        case null                  => null
        case nested: GenericRecord => recordToRow(nested, fs)
        case s if fs.getType == Schema.Type.STRING => s.toString
        case prim                  => prim
      }
    })

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
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new ByteArrayOutputStream(1024)
      var enc: BinaryEncoder = null
      it.map { r =>
        baos.reset()
        enc = EncoderFactory.get().binaryEncoder(baos, enc)
        writer.write(rowToRecord(r.getStruct(1), schema), enc)
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
      val reader = new GenericDatumReader[GenericRecord](schema)
      var dec: BinaryDecoder = null
      var rec: GenericRecord = null
      it.map { r =>
        dec = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](1), dec)
        rec = reader.read(rec, dec)
        Row(r.getLong(0), recordToRow(rec, schema))
      }
    }(Encoders.row(decodedSchema))
  }

  /** Avro-path silver parse: decode + the SAME field extraction as the
    * JSON path — so `cdc_avro_parse` is byte-parity comparable with
    * `cdc_debezium_parse` and shares its DuckDB oracle.
    */
  def parseAvro(df: DataFrame, bytesCol: String, idCol: String = "event_id"): DataFrame =
    Debezium.extractFields(decode(df, bytesCol, idCol))

  /** #175 Registered query: synth envelope → Avro binary → decode →
    * silver extraction (identical projection to [[Debezium.silverParsed]],
    * proving the Avro wire round-trip loses nothing the silver layer
    * reads).
    */
  def avroSilverParsed(spark: SparkSession, dir: String): DataFrame = {
    val env = Debezium.synthEnvelope(spark, dir)
    parseAvro(encode(env, "cdc_event"), "avro_bytes")
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
