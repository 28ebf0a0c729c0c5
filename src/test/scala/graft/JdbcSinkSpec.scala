package graft

import java.util.Properties
import org.apache.spark.sql.functions._
import graft.cdc.Cdc
import graft.sources.JdbcCdcSink

/** Exactly-once JDBC CDC sink (SURVEY §2 #173): the applied Derby state
  * must equal the declarative SCD1 view, replays must be no-ops at both
  * the ledger and the MERGE level, and stale batches must lose to the
  * sequence guard.
  */
class JdbcSinkSpec extends SparkSpec {

  private val props = new Properties
  private val url = "jdbc:derby:memory:graftsinkspec;create=true"

  private def targetState(table: String): Set[(Long, Long, String, Double)] =
    JdbcCdcSink.readTarget(spark, url, table, props)
      .select(col("user_id"), col("last_event_id"), col("last_op"),
        round(col("last_value"), 2).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  test("applied state equals the SCD1 view; replays no-op at both levels") {
    val table = "sink_t1"
    JdbcCdcSink.dropTables(url, table, props)
    val env = Cdc.log(spark, sf).filter(col("event_id") <= 3000)
    // time-ordered epochs, as foreachBatch delivers them
    val Array(lo, hi) = env.agg(min("seq_us"), max("seq_us")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = lo + (hi - lo) / 2
    val b1 = env.filter(col("seq_us") <= mid)
    val b2 = env.filter(col("seq_us") > mid)
    assert(JdbcCdcSink.applyBatch(b1, url, table, 1, props))
    assert(JdbcCdcSink.applyBatch(b2, url, table, 2, props))

    // parity with the declarative latest-per-key view over the same slice
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq_us").desc, col("event_id").desc)
    val expected = env.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= "DELETE")
      .select(col("user_id"), col("event_id"), col("operation"),
        round(col("value"), 2).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    val got = targetState(table)
    assert(got == expected,
      s"state mismatch: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")

    // ledger replay: same batch id is skipped wholesale
    assert(!JdbcCdcSink.applyBatch(b2, url, table, 2, props))
    assert(targetState(table) == expected)

    // MERGE replay (a retried partition): re-running the merge pass with
    // no ledger must converge to the identical state
    JdbcCdcSink.mergeReduced(b2, url, table, props)
    assert(targetState(table) == expected)
  }

  test("sequence guard: a stale batch cannot overwrite newer state") {
    val table = "sink_t2"
    JdbcCdcSink.dropTables(url, table, props)
    import spark.implicits._
    val fresh = Seq((10L, 200L, "UPDATE", 2000L, 9.99))
      .toDF("user_id", "event_id", "operation", "seq_us", "value")
    val stale = Seq(
      (10L, 100L, "UPDATE", 1000L, 1.11), // older seq: must lose
      (20L, 101L, "DELETE", 1000L, 0.0))  // delete of absent key: no-op
    .toDF("user_id", "event_id", "operation", "seq_us", "value")
    assert(JdbcCdcSink.applyBatch(fresh, url, table, 1, props))
    assert(JdbcCdcSink.applyBatch(stale, url, table, 2, props))
    assert(targetState(table) == Set((10L, 200L, "UPDATE", 9.99)))
  }

  test("streaming foreachBatch: kill/restart from checkpoint stays exactly-once") {
    import java.nio.file.{Files, Paths}
    val table = "sink_stream"
    JdbcCdcSink.dropTables(url, table, props)
    val root = Files.createTempDirectory("sink_stream_spec").toString
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    def line(uid: Long, eid: Long, op: String, seq: Long, v: Double) =
      s"$uid,$eid,$op,$seq,$v"
    def start() = spark.readStream
      .option("maxFilesPerTrigger", 1).text(in)
      .selectExpr(
        "CAST(split(value, ',')[0] AS BIGINT) AS user_id",
        "CAST(split(value, ',')[1] AS BIGINT) AS event_id",
        "split(value, ',')[2] AS operation",
        "CAST(split(value, ',')[3] AS BIGINT) AS seq_us",
        "CAST(split(value, ',')[4] AS DOUBLE) AS value")
      .writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch(JdbcCdcSink.forEachBatch(url, table, props))
      .start()

    Files.write(Paths.get(s"$in/a.txt"), Seq(
      line(1, 1, "INSERT", 100, 1.0),
      line(2, 2, "INSERT", 100, 2.0)).mkString("\n").getBytes)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill after epoch 0
    assert(targetState(table) == Set((1L, 1L, "INSERT", 1.0), (2L, 2L, "INSERT", 2.0)))

    // a re-delivered epoch 0 (crash between sink commit and checkpoint
    // commit) hits the ledger and applies nothing
    import spark.implicits._
    val epoch0 = Seq((1L, 1L, "INSERT", 100L, 1.0), (2L, 2L, "INSERT", 100L, 2.0))
      .toDF("user_id", "event_id", "operation", "seq_us", "value")
    assert(!JdbcCdcSink.applyBatch(epoch0, url, table, 0, props))

    // new changes land while the query is DOWN; restart picks them up
    Files.write(Paths.get(s"$in/b.txt"), Seq(
      line(1, 3, "UPDATE", 200, 1.5),
      line(2, 4, "DELETE", 200, 0.0),
      line(3, 5, "INSERT", 200, 3.0)).mkString("\n").getBytes)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(targetState(table) ==
      Set((1L, 3L, "UPDATE", 1.5), (3L, 5L, "INSERT", 3.0)))
  }

  test("delete drops the key and wins over equal-or-older changes") {
    val table = "sink_t3"
    JdbcCdcSink.dropTables(url, table, props)
    import spark.implicits._
    val batch = Seq(
      (1L, 1L, "INSERT", 100L, 1.0),
      (1L, 2L, "DELETE", 200L, 0.0), // latest per key inside the batch
      (2L, 3L, "INSERT", 100L, 2.0))
    .toDF("user_id", "event_id", "operation", "seq_us", "value")
    assert(JdbcCdcSink.applyBatch(batch, url, table, 7, props))
    assert(targetState(table) == Set((2L, 3L, "INSERT", 2.0)))
  }
}
