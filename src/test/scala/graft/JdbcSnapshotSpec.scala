package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.functions._
import graft.sources.JdbcSnapshot

/** Partitioned JDBC snapshot loader (SURVEY §2 #92) against embedded
  * Derby — the same JDBC surface a MySQL/Aurora initial load hits.
  */
class JdbcSnapshotSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftspec;create=true"

  private def seed(n: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE t")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute(
        "CREATE TABLE t (id BIGINT PRIMARY KEY, payload VARCHAR(32))")
      val ps = conn.prepareStatement("INSERT INTO t VALUES (?, ?)")
      (1 to n).foreach { i =>
        ps.setLong(1, i.toLong * 10) // sparse keys: ranges, not row counts
        ps.setString(2, s"row_$i")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("snapshot splits the key range into N parallel partitions") {
    seed(1000)
    val df = JdbcSnapshot.snapshot(spark, url, "t", "id", numPartitions = 8)
    assert(df.rdd.getNumPartitions == 8, "expected 8 parallel JDBC range readers")
    assert(df.count() == 1000)
    // ranges are non-overlapping and exhaustive: no dupes, no loss
    assert(df.select("id").distinct().count() == 1000)
    // with a uniform key spread every range reader gets rows
    val perPart = df.groupBy(spark_partition_id().as("p")).count().collect()
    assert(perPart.length == 8, s"empty JDBC partitions: only ${perPart.length}/8 read rows")
  }

  test("explicit bounds narrow the snapshot window") {
    seed(100)
    val df = JdbcSnapshot.snapshot(spark, url, "t", "id", numPartitions = 4,
      bounds = Some((1L, 500L)))
    // spark jdbc bounds are a partitioning hint, not a filter: stride
    // partitions cover (-inf, +inf); all rows still arrive
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("snapshot rows enter the CDC envelope as SNAPSHOT ops") {
    seed(50)
    val snap = JdbcSnapshot.snapshot(spark, url, "t", "id", numPartitions = 2)
    val env = JdbcSnapshot.asCdcEnvelope(snap, "id")
    assert(env.filter(col("operation") =!= "SNAPSHOT").count() == 0)
    assert(env.filter(col("cdc_operation_raw") =!= "r").count() == 0)
    assert(env.select("seq_key").distinct().count() == 50)
  }

  test("resilientSnapshot retries past injected transient failures and stays exact") {
    seed(500)
    val df = JdbcSnapshot.resilientSnapshot(spark, url, "T", "ID",
      numPartitions = 4, maxAttempts = 3, backoffMs = 1, injectFailures = 2)
    val rows = df.collect()
    assert(rows.length == 500, "retry must deliver every row exactly once")
    assert(rows.map(_.getAs[Long]("ID")).distinct.length == 500)
    // every partition needed exactly injectFailures+1 attempts
    val stats = JdbcSnapshot.readStats(df, "ID").collect()
    assert(stats.length == 4)
    assert(stats.forall(_.getAs[Int]("n_attempts") == 3),
      s"expected 3 attempts per partition, got ${stats.map(_.getAs[Int]("n_attempts")).toSeq}")
    // ranges disjoint and exhaustive
    val ranges = stats.map(r => (r.getAs[Long]("min_key"), r.getAs[Long]("max_key"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "overlapping resilient ranges")
      case _ =>
    }
  }

  test("resilientSnapshot without faults reads in one attempt per partition") {
    seed(200)
    val df = JdbcSnapshot.resilientSnapshot(spark, url, "T", "ID", numPartitions = 3)
    assert(df.count() == 200)
    assert(JdbcSnapshot.readStats(df, "ID").collect()
      .forall(_.getAs[Int]("n_attempts") == 1))
  }

  test("resilientSnapshot exhausts maxAttempts and fails loudly") {
    seed(10)
    val df = JdbcSnapshot.resilientSnapshot(spark, url, "T", "ID",
      numPartitions = 2, maxAttempts = 2, backoffMs = 1, injectFailures = 5)
    val e = intercept[Exception] { df.count() }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("injected"), s"unexpected failure chain: $messages")
  }

  test("keyBounds rejects unsafe identifiers and empty tables") {
    seed(5)
    intercept[IllegalArgumentException] {
      JdbcSnapshot.keyBounds(url, "t; DROP TABLE t", "id")
    }
    intercept[IllegalArgumentException] {
      JdbcSnapshot.keyBounds(url, "t", "id OR 1=1")
    }
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE empty_t")
      catch { case _: java.sql.SQLException => () }
      conn.createStatement().execute("CREATE TABLE empty_t (id BIGINT)")
    } finally conn.close()
    val e = intercept[IllegalStateException] {
      JdbcSnapshot.keyBounds(url, "empty_t", "id")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("incremental pull reads only past the watermark; polls never overlap") {
    seed(100) // versions = ids = 10,20,...,1000
    val p1 = JdbcSnapshot.incrementalPull(spark, url, "t", "id", "id",
      lastSeen = 0L)
    assert(p1.count() == 100)
    val wm1 = JdbcSnapshot.highWatermark(p1, "id")
    assert(wm1 == 1000L)
    // idempotent re-poll from the same watermark: identical result
    assert(JdbcSnapshot.incrementalPull(spark, url, "t", "id", "id", 0L)
      .count() == 100)
    // late arrivals: only they appear past the committed watermark
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement("INSERT INTO t VALUES (?, ?)")
      Seq(1010L, 1020L).foreach { v =>
        ps.setLong(1, v); ps.setString(2, s"late_$v"); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    val p2 = JdbcSnapshot.incrementalPull(spark, url, "t", "id", "id", wm1)
    val got = p2.select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1010L, 1020L)), s"poll 2 read ${got.mkString(",")}")
    assert(JdbcSnapshot.highWatermark(p2, "id") == 1020L)
    // empty poll keeps the caller's watermark
    val p3 = JdbcSnapshot.incrementalPull(spark, url, "t", "id", "id", 1020L)
    assert(p3.count() == 0 && JdbcSnapshot.highWatermark(p3, "id") == -1L)
  }

  test("snapshotStats round-trips events through Derby with 4 range readers") {
    val stats = JdbcSnapshot.snapshotStats(spark, sf).collect()
    assert(stats.length == 4)
    // snapshotStats caps the Derby load at event_id <= 20000 by design
    val expected = Tables.events(spark, sf).filter(col("event_id") <= 20000).count()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == expected)
    assert(stats.forall(_.getAs[String]("operation") == "SNAPSHOT"))
    // partitions carry disjoint id ranges
    val ranges = stats.map(r => (r.getAs[Long]("min_id"), r.getAs[Long]("max_id"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "overlapping JDBC ranges")
      case _ =>
    }
  }
}
