package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.EmbeddedTopicLog
import graft.streaming.CdcStreams

/** Sustained streaming-throughput benchmark over the full CDC gold path:
  * kafkalog produce → Debezium silver parse → SCD1 gold apply — the ONE
  * reference number no batch bench can answer. The reference PUBLISHES
  * its envelope: 10,000–50,000 events/sec through its custom datasource
  * with a 45K events/sec peak and 87 ms average end-to-end latency
  * (reference: COMPARISON.md:33-34,139-143). This main drives the same
  * three-stage architecture this library claims — broker-less topic log
  * with the Kafka read contract ([[graft.sources.KafkaLogSource]]),
  * `from_json` envelope parse ([[graft.cdc.Debezium.parseEnvelope]]),
  * latest-per-key MERGE with delete semantics
  * ([[CdcStreams.applyCdcBatch]]) — under a sustained producer for
  * ≥60 s of steady state, and prints ONE JSON line into
  * `BENCH_STREAM.json`.
  *
  * Measurement protocol: a producer thread appends Debezium-envelope
  * JSON continuously (rate-unbounded, backlog-capped so disk stays
  * bounded and the consumer is never starved — the stream is always
  * admission-controlled by `maxOffsetsPerTrigger`, never input-limited);
  * a StreamingQueryListener stamps every micro-batch with (rows,
  * trigger duration, wall end time). Batches completing inside the
  * first `warmupSec` are discarded (JIT + codegen + first gold write);
  * throughput = measured rows / measured wall window. p50/p95 batch
  * latency is the micro-batch trigger duration — the honest analog of
  * the reference's record-level 87 ms: Structured Streaming amortizes
  * per-event cost into batches, so per-EVENT latency is bounded by the
  * batch interval (reported), not comparable to a record-at-a-time
  * engine's per-record clock.
  *
  * Scale notes (100 TB / real cluster): every stage here is the shape
  * that scales — the topic read is partition-parallel (one task per
  * partition per batch), the parse is whole-stage-codegen'd `from_json`,
  * and the SCD1 apply shuffles the micro-batch against a key-bounded
  * gold table. On a 1000-executor cluster the same plan widens by
  * partition count; the single-node number below is the per-node
  * contribution floor, measured on the same local[32] box the batch
  * bench uses.
  */
object BenchStream {

  /** One deterministic Debezium envelope (byte-stable given its inputs —
    * reruns produce identical streams). Field layout mirrors
    * [[graft.cdc.Debezium.envelopeSchema]]; before/after are the raw
    * JSON images, op ∈ c/u/d, ts_ms monotone in event id so
    * latest-per-key is well-defined without wall clocks.
    */
  def envelope(eventId: Long, userId: Long, op: Char, tsMs: Long,
      valueCents: Long): String = {
    val img =
      s"""{"user_id":$userId,"event_id":$eventId,"value":${valueCents / 100.0}}"""
    val before = if (op == 'c') "null" else img
    val after = if (op == 'd') "null" else img
    s"""{"before":$before,"after":$after,"source":{"version":"2.4.0","connector":"mysql","name":"graft","ts_ms":$tsMs,"snapshot":"false","db":"graftdb","table":"events","server_id":1,"gtid":"0-1-$eventId","file":"binlog.000001","pos":${eventId * 4},"row":0,"thread":7,"query":null},"op":"$op","ts_ms":$tsMs,"transaction":{"id":"tx-$userId","total_order":1,"data_collection_order":1}}"""
  }

  /** A produce chunk of `n` keyed records starting at `fromId`: user =
    * id mod keySpace (key-sticky partitioning — Kafka's per-key ordering
    * contract), op mix 5% DELETE / 19% INSERT / 76% UPDATE by id, ts_ms
    * = id (monotone).
    */
  def chunk(fromId: Long, n: Int, keySpace: Int): Seq[(String, String)] =
    (fromId until fromId + n).map { id =>
      val user = id % keySpace
      val op = if (id % 20 == 0) 'd' else if (id % 5 == 0) 'c' else 'u'
      (user.toString, envelope(id, user, op, tsMs = id, valueCents = id % 10000))
    }

  /** Silver projection: raw Kafka-contract rows → parsed envelope →
    * the (user_id, operation, ts_us, event_id, value) frame
    * [[CdcStreams.applyCdcBatch]] merges. Identity fields come out of
    * the captured image (after for upserts, before for deletes) — the
    * same second-level extraction `cdc_debezium_parse` pins against the
    * DuckDB oracle.
    */
  def silver(raw: DataFrame): DataFrame =
    graft.cdc.Debezium
      .parseEnvelope(raw.selectExpr("CAST(value AS STRING) AS cdc_event"), "cdc_event")
      .selectExpr(
        "CAST(get_json_object(coalesce(after_image, before_image), '$.user_id') AS BIGINT) AS user_id",
        "operation",
        "event_ts_ms * 1000 AS ts_us",
        "CAST(get_json_object(coalesce(after_image, before_image), '$.event_id') AS BIGINT) AS event_id",
        "CAST(coalesce(get_json_object(after_image, '$.value'), '0') AS DOUBLE) AS value")

  /** Start the gold query: kafkalog micro-batch stream → silver →
    * foreachBatch SCD1 apply onto `goldPath`. `maxPerTrigger` is the
    * admission-control knob (lag-proportional across partitions inside
    * the source).
    */
  def startGoldQuery(spark: SparkSession, logRoot: String, topic: String,
      goldPath: String, checkpoint: String,
      maxPerTrigger: Long): StreamingQuery = {
    val raw = spark.readStream.format("kafkalog")
      .option("path", logRoot).option("topic", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxPerTrigger.toString)
      .load()
    silver(raw).writeStream
      .queryName("bench_stream_gold")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an EMPTY micro-batch (back-to-back trigger between produce
        // chunks) must not rewrite gold: the merge would be an identity,
        // but the parquet swap is a full table rewrite — measured as the
        // dominant latency-floor term before this guard
        if (!batch.isEmpty) CdcStreams.applyCdcBatch(spark, batch, goldPath)
      }
      .start()
  }

  private case class BatchStat(batchId: Long, rows: Long, durMs: Long,
      endNanos: Long)

  /** LATENCY mode (`SPARK_GRAFT_STREAM_MODE=latency`) — the reference's
    * remaining envelope number is "87 ms average end-to-end latency"
    * (COMPARISON.md:139-143), a RECORD-AT-A-TIME engine's clock. The
    * honest micro-batch analog is produce-to-gold-VISIBLE wall time under
    * a light load (latency is meaningless at saturation — queueing
    * dominates): a metered producer stamps each produce chunk with its
    * wall clock, and the gold foreachBatch — AFTER the SCD1 merge
    * commits, i.e. when the data is actually queryable — drains every
    * chunk whose last event id the batch has applied and samples
    * (now − produceTime). Per-chunk sampling at small chunks (≤200
    * events) bounds granularity error under the batch interval.
    * Structured Streaming's floor here is the trigger cycle (get offsets
    * → plan → run → commit), so the p50 lands in the hundreds of ms —
    * reported as-is with this architectural note rather than tuned into
    * a number that wouldn't survive a real cluster. Spark's continuous
    * mode is NOT used: it forbids aggregations/foreachBatch, so the gold
    * MERGE this pipeline exists for cannot run there.
    */
  /** One metered latency measurement at a given trigger setting; returns
    * (p50 ms, p95 ms, avg ms, n_samples). `triggerMs` < 0 = default
    * trigger (back-to-back micro-batches); ≥ 0 = ProcessingTime(ms).
    */
  def latencyOnce(spark: SparkSession, triggerMs: Long,
      warmupSec: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_WARMUP", "15").toInt,
      measureSec: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEC", "45").toInt,
      keySpace: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYS", "100000").toInt,
      partitions: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8").toInt,
      ratePerSec: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "2000").toInt)
      : (Long, Long, Long, Int) = {
    val chunkN = math.max(1, math.min(200, ratePerSec / 10))

    val root = Files.createTempDirectory("graft-benchstream-lat").toString
    val (logRoot, topic) = (s"$root/log", "bench_cdc_lat")
    val (gold, ckpt) = (s"$root/gold", s"$root/ckpt")

    val stop = new AtomicBoolean(false)
    // (last event id of the chunk, produce wall nanos)
    val inFlight = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cutoff = new AtomicLong(Long.MaxValue)

    EmbeddedTopicLog.produce(logRoot, topic, chunk(0L, chunkN, keySpace),
      partitions)
    val producer = new Thread(() => {
      var id = chunkN.toLong
      val sleepMs = math.max(1L, chunkN * 1000L / ratePerSec)
      while (!stop.get()) {
        // enqueue BEFORE the append becomes visible: if a batch commits
        // the chunk in the produce→enqueue window, the drain would miss
        // it this batch and record the NEXT batch's clock — an inflated
        // sample. Stamping first biases the other way by only the
        // (sub-ms) produce call itself.
        inFlight.add((id + chunkN - 1, System.nanoTime()))
        EmbeddedTopicLog.produce(logRoot, topic,
          chunk(id, chunkN, keySpace), partitions)
        id += chunkN
        Thread.sleep(sleepMs)
      }
    }, "benchstream-latency-producer")
    producer.setDaemon(true)

    val raw = spark.readStream.format("kafkalog")
      .option("path", logRoot).option("topic", topic)
      .option("startingOffsets", "earliest")
      .load()
    val writer0 = silver(raw).writeStream
      .queryName("bench_stream_latency_gold")
      .option("checkpointLocation", ckpt)
    val writer = if (triggerMs < 0) writer0
      else writer0.trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(triggerMs))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        // max over an EMPTY micro-batch (legal between produce chunks) is
        // NULL: skip BOTH the gold rewrite (identity merge, but a full
        // parquet swap — the measured floor term) and the drain.
        val maxIdRow = b.agg(org.apache.spark.sql.functions.max("event_id"))
          .head()
        if (!maxIdRow.isNullAt(0)) {
          CdcStreams.applyCdcBatch(spark, b, gold)
          // gold is committed — everything in this batch is now queryable
          val maxId = maxIdRow.getLong(0)
          val now = System.nanoTime()
          var head = inFlight.peek()
          while (head != null && head._1 <= maxId) {
            inFlight.poll()
            if (now >= cutoff.get()) samples.add(now - head._2)
            head = inFlight.peek()
          }
        }
        b.unpersist()
        ()
      }
      .start()
    producer.start()
    Thread.sleep(warmupSec * 1000L)
    cutoff.set(System.nanoTime())
    Thread.sleep(measureSec * 1000L)
    stop.set(true)
    producer.join(5000)
    q.stop(); q.awaitTermination(30000)

    val lats = samples.toArray(Array.empty[java.lang.Long])
      .map(_.longValue() / 1000000L).sorted // ms
    def pct(p: Double): Long =
      if (lats.isEmpty) -1L
      else lats(math.min(lats.length - 1, math.ceil(p * lats.length).toInt - 1))
    val avg = if (lats.isEmpty) -1L else lats.sum / lats.length
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    (pct(0.50), pct(0.95), avg, lats.length)
  }

  /** The LATENCY-FLOOR sweep: [[latencyOnce]] at three trigger settings —
    * default (back-to-back: a new batch starts the instant the previous
    * commits), ProcessingTime(100 ms) and ProcessingTime(500 ms) — so the
    * floor DECOMPOSITION is measured, not asserted. Round-8 measurements
    * (2K ev/s, local[32]): ~800 / ~707 / ~697 ms p50 — i.e. the floor is
    * NOT the trigger interval, it is the BATCH COST: every non-empty
    * batch's SCD1 apply rewrites the whole gold parquet (the swap in
    * [[CdcStreams.applyCdcBatch]]), ~600-700 ms at a 100K-key gold, and
    * an event waits for the in-flight batch plus its own. Two consequences
    * implemented here: (1) empty micro-batches must SKIP the gold rewrite
    * (an identity merge still paid the full swap — fixing that took the
    * back-to-back arm from 944 to 800 ms p50); (2) sweeping the trigger
    * is ~flat because batch cost exceeds every tested interval. The real
    * lever toward the reference's 87 ms record-at-a-time clock is a
    * key-partitioned or log-structured gold target (rewrite touched
    * partitions only), not trigger tuning; Spark's async progress
    * tracking is inapplicable (requires a stateless query with a Kafka
    * sink — a foreachBatch MERGE commit is exactly what it excludes).
    */
  def latencyMain(spark: SparkSession,
      outPath: String = "BENCH_STREAM_LATENCY.json"): Unit = {
    val ratePerSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "2000").toInt
    val measureSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEC", "45").toInt
    val sweep = Seq(-1L, 100L, 500L)
    val arms = sweep.map { t =>
      val (p50, p95, avg, n) = latencyOnce(spark, t)
      val label = if (t < 0) "default (back-to-back)" else s"processing_time_${t}ms"
      println(s"[latency-sweep] $label: p50=$p50 p95=$p95 avg=$avg n=$n")
      s"""{"trigger":"$label","p50":$p50,"p95":$p95,"avg":$avg,"n_samples":$n}"""
    }
    val json =
      s"""{"metric":"stream_e2e_latency_ms","sweep":[${arms.mkString(",")}],""" +
        s""""rate_events_per_sec":$ratePerSec,"measure_sec_per_arm":$measureSec,""" +
        s""""semantics":"produce wall-clock -> SCD1 gold COMMITTED (queryable), per-chunk sampling",""" +
        s""""floor_decomposition":"floor = batch cost (gold parquet swap ~600-700ms at 100K keys), not trigger interval: sweep is ~flat, empty-batch gold rewrites skipped (944->800ms p50); reaching ~87ms needs a key-partitioned gold target; async progress tracking inapplicable to a foreachBatch MERGE sink",""" +
        s""""reference_envelope":"87ms avg end-to-end latency, record-at-a-time clock (COMPARISON.md:139-143)"}"""
    Files.writeString(Paths.get(outPath), json)
    println(json)
  }

  /** RECOVERY mode (`SPARK_GRAFT_STREAM_MODE=recovery`) — the last
    * published reference number with no analog here: the reference claims
    * 30 s (custom datasource) / 45 s (Debezium arm) recovery-from-failure
    * and 99.99% vs 100% consistency (reference: COMPARISON.md:147-150).
    * Protocol: drive the same kafkalog → silver → SCD1-gold pipeline as
    * the throughput bench (single producer so the event-id space stays a
    * contiguous [0, produced) — the exactly-once audit recomputes the
    * expected gold state from that range), then TWO kill/restart cycles
    * against the SAME checkpoint:
    *
    *  - arm `mid_steady`: stop the query at an arbitrary steady-state
    *    instant (whatever the trigger loop is doing);
    *  - arm `mid_batch`: wait for a batch-commit event, sleep ~40% of the
    *    median batch duration, then stop — the query dies with a batch in
    *    flight, so the restart REPLAYS that batch from the checkpointed
    *    offsets (the path [[CdcStreams.applyCdcBatch]]'s rename-retire
    *    swap and idempotent merge exist for).
    *
    * The producer keeps producing through both outages (upstream never
    * pauses for a consumer crash); per arm we report seconds from
    * restart() to the first COMMITTED batch (the reference's
    * "recovery time") plus the backlog at restart, then after the second
    * recovery stop the producer and report seconds-to-backlog-drain.
    * Exactly-once is ASSERTED, not assumed: the final gold parquet is
    * anti-joined both ways against the expected SCD1 state recomputed
    * from the full produced id range (latest-per-user by (ts_us,
    * event_id), DELETE drops) — `state_mismatches` must print 0, i.e.
    * the reference's 100%-consistency row, measured across two kills.
    */
  def recoveryMain(spark: SparkSession,
      warmupSec: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_WARMUP", "12").toInt,
      outageSec: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUTAGE", "5").toInt,
      keySpace: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYS", "100000").toInt,
      partitions: Int = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "16").toInt,
      maxPerTrigger: Long = sys.env.getOrElse("SPARK_GRAFT_STREAM_TRIGGER", "250000").toLong,
      outPath: String = "BENCH_STREAM_RECOVERY.json"): Unit = {
    val produceChunk = 25000
    val root = Files.createTempDirectory("graft-benchstream-rec").toString
    val (logRoot, topic) = (s"$root/log", "bench_cdc_rec")
    val (gold, ckpt) = (s"$root/gold", s"$root/ckpt")

    val produced = new AtomicLong(0L)
    val consumed = new AtomicLong(0L)
    val stop = new AtomicBoolean(false)
    val backlogCap = 4 * maxPerTrigger
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[BatchStat]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        consumed.addAndGet(p.numInputRows)
        val dur = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue()).getOrElse(0L)
        stats.add(BatchStat(p.batchId, p.numInputRows, dur, System.nanoTime()))
      }
    }
    spark.streams.addListener(listener)

    // SINGLE producer: contiguous blocks -> ids form [0, produced) exactly
    produced.addAndGet(EmbeddedTopicLog.produce(logRoot, topic,
      chunk(0L, produceChunk, keySpace), partitions))
    val producer = new Thread(() => {
      var block = 1L
      while (!stop.get()) {
        if (produced.get() - consumed.get() > backlogCap) Thread.sleep(5)
        else {
          EmbeddedTopicLog.produce(logRoot, topic,
            chunk(block * produceChunk, produceChunk, keySpace), partitions)
          block += 1
          produced.addAndGet(produceChunk)
        }
      }
    }, "benchstream-recovery-producer")
    producer.setDaemon(true)

    def commitsAfter(t: Long): Seq[BatchStat] =
      stats.toArray(Array.empty[BatchStat]).filter(s => s.endNanos >= t && s.rows > 0)

    var q = startGoldQuery(spark, logRoot, topic, gold, ckpt, maxPerTrigger)
    producer.start()
    Thread.sleep(warmupSec * 1000L)

    def killAndRecover(arm: String, midBatch: Boolean): String = {
      if (midBatch) {
        // align the stop inside a running batch: wait for a fresh commit,
        // then sleep ~40% of the median batch wall before stopping
        val before = stats.size()
        val deadline = System.nanoTime() + 10000000000L
        while (stats.size() == before && System.nanoTime() < deadline)
          Thread.sleep(20)
        val durs = stats.toArray(Array.empty[BatchStat]).map(_.durMs).sorted
        val med = if (durs.isEmpty) 500L else durs(durs.length / 2)
        Thread.sleep(math.max(50L, (med * 2) / 5))
      }
      val tStop0 = System.nanoTime()
      q.stop(); q.awaitTermination(30000)
      val stopMs = (System.nanoTime() - tStop0) / 1000000L
      Thread.sleep(outageSec * 1000L) // producer keeps running
      val backlog = produced.get() - consumed.get()
      val tRestart = System.nanoTime()
      q = startGoldQuery(spark, logRoot, topic, gold, ckpt, maxPerTrigger)
      val deadline = System.nanoTime() + 120000000000L
      while (commitsAfter(tRestart).isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      val firstCommit = commitsAfter(tRestart).headOption
      val recSec = firstCommit
        .map(s => (s.endNanos - tRestart) / 1e9).getOrElse(-1.0)
      s"""{"kill":"$arm","stop_ms":$stopMs,"outage_sec":$outageSec,""" +
        s""""backlog_at_restart":$backlog,""" +
        s""""first_commit_sec":${"%.2f".format(recSec)}}"""
    }

    val armSteady = killAndRecover("mid_steady", midBatch = false)
    Thread.sleep(5000L) // re-enter steady state between arms
    val armMid = killAndRecover("mid_batch", midBatch = true)

    // drain: stop producing, measure catch-up from the second recovery
    stop.set(true); producer.join(5000)
    val producedTotal = produced.get()
    val tDrain0 = System.nanoTime()
    val drainDeadline = System.nanoTime() + 300000000000L
    while (consumed.get() < producedTotal && System.nanoTime() < drainDeadline)
      Thread.sleep(50)
    val drainSec = (System.nanoTime() - tDrain0) / 1e9
    q.stop(); q.awaitTermination(30000)

    // exactly-once audit: expected SCD1 state from the produced id range
    val expected = spark.range(0, producedTotal).selectExpr(
        s"id % $keySpace AS user_id",
        "CASE WHEN id % 20 = 0 THEN 'DELETE' WHEN id % 5 = 0 THEN 'INSERT' " +
          "ELSE 'UPDATE' END AS operation",
        "id * 1000 AS ts_us", "id AS event_id",
        "CASE WHEN id % 20 = 0 THEN CAST(0 AS DOUBLE) " +
          "ELSE CAST(id % 10000 AS DOUBLE) / 100.0 END AS value")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(org.apache.spark.sql.functions.col("ts_us").desc,
            org.apache.spark.sql.functions.col("event_id").desc)))
      .filter("rn = 1 AND operation <> 'DELETE'").drop("rn")
    val actual = spark.read.parquet(gold)
    val mismatches =
      expected.exceptAll(actual).count() + actual.exceptAll(expected).count()

    val json =
      s"""{"metric":"stream_recovery","arms":[$armSteady,$armMid],""" +
        s""""drain_sec":${"%.2f".format(drainSec)},""" +
        s""""produced_total":$producedTotal,"gold_rows":${actual.count()},""" +
        s""""state_mismatches":$mismatches,""" +
        s""""pipeline":"kafkalog -> debezium silver parse -> SCD1 gold apply (checkpointed)",""" +
        s""""semantics":"first_commit_sec = restart() -> first COMMITTED batch; state_mismatches = exactly-once audit vs recomputed SCD1 expectation",""" +
        s""""reference_envelope":"30s custom / 45s debezium recovery, 99.99% vs 100% consistency (COMPARISON.md:147-150)"}"""
    Files.writeString(Paths.get(outPath), json)
    println(json)
    spark.streams.removeListener(listener)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    if (mismatches != 0)
      throw new IllegalStateException(
        s"exactly-once violated across kill/restart: $mismatches mismatching rows")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmupSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_WARMUP", "20").toInt
    val measureSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEC", "60").toInt
    val keySpace = sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYS", "100000").toInt
    val partitions = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "16").toInt
    val maxPerTrigger =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_TRIGGER", "250000").toLong
    val produceChunk = 25000

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (sys.env.get("SPARK_GRAFT_STREAM_MODE").contains("latency")) {
      try latencyMain(spark) finally spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_STREAM_MODE").contains("recovery")) {
      try recoveryMain(spark) finally spark.stop()
      return
    }

    val root = Files.createTempDirectory("graft-benchstream").toString
    val (logRoot, topic) = (s"$root/log", "bench_cdc")
    val (gold, ckpt) = (s"$root/gold", s"$root/ckpt")

    val produced = new AtomicLong(0L)
    val consumed = new AtomicLong(0L)
    val stop = new AtomicBoolean(false)
    // backlog cap: the producer stays 2-4 triggers ahead — the consumer
    // is never input-starved, disk usage stays bounded (~4 triggers of
    // ~350-byte envelopes), and throughput is consumer-limited by
    // construction (the quantity under test)
    val backlogCap = 4 * maxPerTrigger

    val stats = new java.util.concurrent.ConcurrentLinkedQueue[BatchStat]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        consumed.addAndGet(p.numInputRows)
        // triggerExecution is the batch's total wall; the other durationMs
        // entries (addBatch, getBatch, walCommit, …) are its COMPONENTS —
        // summing the map double-counts
        val dur = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue()).getOrElse(0L)
        stats.add(BatchStat(p.batchId, p.numInputRows, dur, System.nanoTime()))
      }
    }
    spark.streams.addListener(listener)

    // seed the topic so batch 0 has data, then sustain from TWO producer
    // threads (a single thread builds envelopes at ~180K/s — below what
    // the consumer drains; two keep the bench consumer-limited, which is
    // the quantity under test). Threads own disjoint alternating id
    // blocks; produce() itself serializes per topic, so segment offsets
    // never race. Cross-thread interleaving can reorder APPENDS but not
    // SCD1 semantics: ts_ms = id and the gold window orders by
    // (ts_us, event_id), so latest-per-key is append-order independent.
    val nProducers = 2
    produced.addAndGet(EmbeddedTopicLog.produce(logRoot, topic,
      chunk(0L, produceChunk, keySpace), partitions))
    val producers = (0 until nProducers).map { t =>
      val th = new Thread(() => {
        var block = 1L + t // block 0 was the seed
        while (!stop.get()) {
          if (produced.get() - consumed.get() > backlogCap) Thread.sleep(5)
          else {
            EmbeddedTopicLog.produce(logRoot, topic,
              chunk(block * produceChunk, produceChunk, keySpace), partitions)
            block += nProducers
            produced.addAndGet(produceChunk)
          }
        }
      }, s"benchstream-producer-$t")
      th.setDaemon(true)
      th
    }

    val q = startGoldQuery(spark, logRoot, topic, gold, ckpt, maxPerTrigger)
    val t0 = System.nanoTime()
    producers.foreach(_.start())
    val cutoffNanos = t0 + warmupSec * 1000000000L
    Thread.sleep((warmupSec + measureSec) * 1000L)
    stop.set(true)
    producers.foreach(_.join(5000))
    val backlogEnd = produced.get() - consumed.get()
    q.stop()
    q.awaitTermination(30000)

    val all = stats.toArray(Array.empty[BatchStat]).sortBy(_.batchId)
    val measured = all.filter(s => s.endNanos >= cutoffNanos && s.rows > 0)
    val tEnd = measured.lastOption.map(_.endNanos).getOrElse(cutoffNanos)
    val wallSec = math.max((tEnd - cutoffNanos) / 1e9, 1e-9)
    val nEvents = measured.map(_.rows).sum
    val evPerSec = nEvents / wallSec
    val durs = measured.map(_.durMs).sorted
    def pct(p: Double): Long =
      if (durs.isEmpty) 0L
      else durs(math.min(durs.length - 1, math.ceil(p * durs.length).toInt - 1))
    val procPerSec =
      if (measured.isEmpty) 0.0
      else nEvents.toDouble * 1000.0 / math.max(measured.map(_.durMs).sum, 1L)
    val goldRows =
      try spark.read.parquet(gold).count() catch { case _: Exception => -1L }

    val json =
      s"""{"metric":"stream_events_per_sec","value":${evPerSec.round},""" +
        s""""unit":"events/sec","sustained_sec":${"%.1f".format(wallSec)},""" +
        s""""events_measured":$nEvents,"batches_measured":${measured.length},""" +
        s""""p50_batch_ms":${pct(0.50)},"p95_batch_ms":${pct(0.95)},""" +
        s""""processing_events_per_sec":${procPerSec.round},""" +
        s""""warmup_sec":$warmupSec,"max_offsets_per_trigger":$maxPerTrigger,""" +
        s""""partitions":$partitions,"key_space":$keySpace,""" +
        s""""gold_rows":$goldRows,"produced_total":${produced.get()},""" +
        s""""backlog_end":$backlogEnd,""" +
        s""""pipeline":"kafkalog -> debezium silver parse -> SCD1 gold apply",""" +
        s""""reference_envelope":"10000-50000 ev/s sustained, 45000 peak, 87ms avg latency (COMPARISON.md:33-34,139-143)"}"""
    Files.writeString(Paths.get("BENCH_STREAM.json"), json)
    println(json)
    // the embedded log/checkpoint/gold are scratch — delete like lagDemo
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
