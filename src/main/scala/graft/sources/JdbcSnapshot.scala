package graft.sources

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** SQL identifiers are interpolated into snapshot queries; accept only
    * plain `word.word` chains or already-double-quoted identifiers so a
    * caller-supplied string can't smuggle SQL (ADVICE r2).
    */
  private[graft] def validIdent(s: String): String = {
    val plain = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"
    val quoted = "\"[^\"]+\"(\\.\"[^\"]+\")*"
    require(s.matches(plain) || s.matches(quoted),
      s"unsafe SQL identifier: '$s' (use plain or double-quoted names)")
    s
  }

  /** Min/max of the partition column via one tiny driver-side query (the
    * reference computes the same bounds before splitting,
    * unity_catalog_cdc_demo.py:232-238). Fails fast with a clear error on
    * an empty table (MIN/MAX are SQL NULL there — without the wasNull
    * check they'd silently read as (0,0) and produce a degenerate split).
    */
  def keyBounds(url: String, table: String, partitionCol: String,
      props: Properties = new Properties): (Long, Long) = {
    validIdent(table); validIdent(partitionCol)
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MIN($partitionCol), MAX($partitionCol) FROM $table")
      rs.next()
      val lo = rs.getLong(1)
      if (rs.wasNull()) throw new IllegalStateException(
        s"cannot derive snapshot bounds: table $table is empty")
      val hi = rs.getLong(2)
      (lo, hi)
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

  /** Resilient partitioned snapshot — the reference's pooled reader with
    * retry-with-backoff and connection health checks
    * (connection_pool_v2.py:78-140), re-expressed as per-partition
    * imperative logic (the one place mapPartitions-style code is the right
    * tool: retry semantics cannot be declared to Catalyst).
    *
    * Each of `numPartitions` tasks owns one non-overlapping key range and
    * reads it with up to `maxAttempts` attempts, exponential backoff
    * (`backoffMs · 2^attempt`), and a `Connection.isValid` health probe
    * before each query. The whole range re-reads on retry — partition
    * ranges are sized to fit executor memory anyway, and range re-read is
    * the only granularity that stays exactly-once without server-side
    * cursors. Every output row carries (`jdbc_partition`, `n_attempts`) so
    * per-partition read health is a groupBy away ([[readStats]]).
    *
    * `injectFailures` makes the first N attempts of EVERY partition throw a
    * synthetic transient SQLException — deterministic fault injection for
    * tests; leave 0 in production.
    */
  def resilientSnapshot(spark: SparkSession, url: String, table: String,
      partitionCol: String, numPartitions: Int,
      maxAttempts: Int = 3, backoffMs: Long = 50,
      bounds: Option[(Long, Long)] = None,
      injectFailures: Int = 0,
      props: Properties = new Properties): DataFrame = {
    validIdent(table); validIdent(partitionCol)
    require(numPartitions > 0 && maxAttempts > 0)
    val (lo, hi) = bounds.getOrElse(keyBounds(url, table, partitionCol, props))
    // schema discovery via the stock reader: lazy, issues only a
    // WHERE-1=0 metadata query, no Spark job
    val schema = spark.read.jdbc(url, table, props).schema
    val outSchema = schema
      .add(StructField("jdbc_partition", IntegerType, nullable = false))
      .add(StructField("n_attempts", IntegerType, nullable = false))

    // Spark-JDBC-style stride split: first/last ranges unbounded so rows
    // outside the sampled [lo, hi] (concurrent inserts) still land somewhere
    val stride = math.max(1L, (hi - lo) / numPartitions)
    val ranges: Seq[(Int, Option[Long], Option[Long])] =
      (0 until numPartitions).map { i =>
        val rLo = if (i == 0) None else Some(lo + stride * i)
        val rHi = if (i == numPartitions - 1) None else Some(lo + stride * (i + 1))
        (i, rLo, rHi)
      }

    val fields = schema.fields // serialized to tasks once
    val rowsRdd = spark.sparkContext.parallelize(ranges, numPartitions)
      .flatMap { case (idx, rLo, rHi) =>
        val pred = (rLo.map(v => s"$partitionCol >= $v") ++
          rHi.map(v => s"$partitionCol < $v")) match {
          case Nil => Seq("1=1")
          case ps => ps.toSeq
        }
        val sql = s"SELECT * FROM $table WHERE ${pred.mkString(" AND ")}"
        var attempt = 0
        var out: scala.collection.mutable.ArrayBuffer[Row] = null
        while (out == null) {
          attempt += 1
          try {
            if (attempt <= injectFailures)
              throw new java.sql.SQLTransientException(s"injected failure $attempt")
            val conn = DriverManager.getConnection(url, props)
            try {
              if (!conn.isValid(5))
                throw new java.sql.SQLTransientConnectionException("connection unhealthy")
              val rs = conn.createStatement().executeQuery(sql)
              val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
              while (rs.next()) {
                val vals = new Array[Any](fields.length + 2)
                var i = 0
                while (i < fields.length) {
                  val v: Any = fields(i).dataType match {
                    case LongType => rs.getLong(i + 1)
                    case IntegerType => rs.getInt(i + 1)
                    case ShortType => rs.getShort(i + 1)
                    case ByteType => rs.getByte(i + 1)
                    case DoubleType => rs.getDouble(i + 1)
                    case FloatType => rs.getFloat(i + 1)
                    case BooleanType => rs.getBoolean(i + 1)
                    case StringType => rs.getString(i + 1)
                    case TimestampType => rs.getTimestamp(i + 1)
                    case DateType => rs.getDate(i + 1)
                    case BinaryType => rs.getBytes(i + 1)
                    case _: DecimalType => rs.getBigDecimal(i + 1)
                    case other => throw new IllegalArgumentException(
                      s"unsupported JDBC snapshot type: $other")
                  }
                  vals(i) = if (rs.wasNull()) null else v
                  i += 1
                }
                vals(fields.length) = idx
                vals(fields.length + 1) = attempt
                buf += Row.fromSeq(vals.toIndexedSeq)
              }
              out = buf
            } finally conn.close()
          } catch {
            case e: java.sql.SQLException if attempt < maxAttempts =>
              Thread.sleep(backoffMs << (attempt - 1))
            // final attempt: propagate — the task (and query) fails loudly
          }
        }
        out
      }
    spark.createDataFrame(rowsRdd, outSchema)
  }

  /** Timestamp-watermark incremental pull — the reference's fallback CDC
    * mode when binlog parsing is unavailable (partition.py:40-62: `WHERE
    * updated_at > offset` per table): read ONLY rows whose watermark
    * column advanced past `lastSeen`, split over `numPartitions` disjoint
    * key-hash predicates so the incremental read parallelizes like the
    * snapshot. Each predicate is pushed into the database (Spark's
    * per-partition WHERE), so an indexed watermark column makes the poll
    * O(changed rows), not O(table). Idempotent: re-polling with the same
    * watermark returns the same rows — the caller advances the watermark
    * to [[highWatermark]] of the returned frame after a successful commit,
    * exactly the offset contract of the streaming source.
    */
  def incrementalPull(spark: SparkSession, url: String, table: String,
      keyCol: String, watermarkCol: String, lastSeen: Long,
      numPartitions: Int = 4, props: Properties = new Properties): DataFrame = {
    val (k, w) = (validIdent(keyCol), validIdent(watermarkCol))
    val predicates = (0 until numPartitions).toArray.map(i =>
      s"MOD($k, $numPartitions) = $i AND $w > $lastSeen")
    spark.read.jdbc(url, table, predicates, props)
  }

  /** The next poll's watermark: max over the frame's watermark column
    * (one tiny agg; -1 on an empty pull so the caller keeps `lastSeen`).
    */
  def highWatermark(pulled: DataFrame, watermarkCol: String): Long = {
    val r = pulled.agg(max(col(watermarkCol).cast("long"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** Per-partition read health for a [[resilientSnapshot]] frame: row
    * count, key range, and the attempt count the partition needed — the
    * reference's pool stats (connection_pool_v2.py:120-140) as a frame.
    */
  def readStats(snap: DataFrame, keyCol: String): DataFrame =
    snap.groupBy(col("jdbc_partition"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        max(col("n_attempts")).as("n_attempts"))

  /** Snapshot rows → the unified CDC envelope: every row is a SNAPSHOT
    * read (Debezium op 'r'), sequenced by the key so a downstream merge
    * treats the initial load exactly like replayed changes
    * (dlt_cdc_pipeline.py:190-197 maps 'r' the same way).
    */
  def asCdcEnvelope(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("operation", lit("SNAPSHOT"))
      .withColumn("cdc_operation_raw", lit("r"))
      .withColumn("seq_key", col(keyCol).cast("long"))

  /** Registered incremental-poll demo: a bounded events slice loads into
    * Derby with a monotonically-increasing `version` column; poll #1 from
    * watermark 0 captures the backlog, late rows then land, poll #2 from
    * poll #1's high watermark captures EXACTLY the late rows. (rows-only:
    * the oracle has no JDBC endpoint; JdbcSnapshotSpec proves the
    * non-overlap and idempotence contracts.)
    */
  def incrementalStats(spark: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:graftinc;create=true"
    val props = new Properties
    val src = graft.Tables.events(spark, dir)
      .filter(col("event_id") <= 5000)
      .select("event_id", "user_id", "event_type", "value")
      .withColumn("version", col("event_id"))
    val conn = DriverManager.getConnection(url, props)
    try {
      try conn.createStatement().execute("DROP TABLE events_inc")
      catch { case _: java.sql.SQLException => () } // first run: no table
    } finally conn.close()
    src.filter(col("event_id") <= 4000)
      .write.mode("append").jdbc(url, "events_inc", props)
    val pull1 = incrementalPull(spark, url, "events_inc",
      "\"event_id\"", "\"version\"", lastSeen = 0L)
    // materialize BEFORE the late rows land: the pull is lazy
    val n1 = pull1.count()
    val wm1 = highWatermark(pull1, "version")
    src.filter(col("event_id") > 4000)
      .write.mode("append").jdbc(url, "events_inc", props)
    val pull2 = incrementalPull(spark, url, "events_inc",
      "\"event_id\"", "\"version\"", lastSeen = wm1)
    val n2 = pull2.count()
    val wm2 = highWatermark(pull2, "version")
    import spark.implicits._
    Seq((1, n1, wm1), (2, n2, wm2)).toDF("poll", "n_rows", "high_watermark")
  }

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
    // which an unquoted identifier would case-fold past. The RESILIENT
    // reader (the reference-faithful pooled path) owns the split here: its
    // stride arithmetic — stride = max(1, (hi-lo)/numPartitions), ends
    // unbounded — is the documented contract the DuckDB oracle replays,
    // and each row carries its jdbc_partition tag so the range proof needs
    // no spark_partition_id introspection
    val snap = resilientSnapshot(spark, url, "events_snap", "\"event_id\"",
      numPartitions = 4)
    asCdcEnvelope(snap, "event_id")
      .groupBy(col("jdbc_partition"))
      .agg(count(lit(1)).as("n_rows"),
        min("event_id").as("min_id"), max("event_id").as("max_id"),
        first("operation").as("operation"))
  }
}
