package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Targeted key deletion over a partitioned store — the
  * right-to-be-forgotten / training-data-takedown operation
  * (reference analog: the DELETE arm of the CDC MERGE in
  * notebooks/demo/unity_catalog_cdc_demo.py — here applied
  * retroactively to data at rest).
  *
  * The 100 TB shape: never rewrite the table. Phase 1 finds the
  * partitions that actually contain the doomed keys with a
  * key-column-only scan (column pruning means bytes read ≈ one column of
  * the affected dates; partition stats could prune further). Phase 2
  * anti-joins ONLY those partitions and swaps them via dynamic partition
  * overwrite — every untouched partition keeps its files byte-identical
  * (ForgetSpec asserts unchanged mtimes), so a 3-year store forgetting a
  * user seen on 4 days rewrites 4 partitions.
  */
object Forget {

  /** Delete `keys` from the `keyCol` of the date-partitioned store at
    * `path` (layout of [[Tables.writeDatePartitioned]]: `__d=` partition
    * dirs). Returns per-partition accounting: rows before/after for
    * REWRITTEN partitions only. The rewritten frame is localCheckpointed
    * before the overwrite — Spark refuses to overwrite a path it is
    * lazily reading from.
    */
  def forgetKeys(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Long]): DataFrame = {
    val store = spark.read.parquet(path)
    val affected = store.filter(col(keyCol).isin(keys: _*))
      .select("__d").distinct().collect().map(_.get(0))
    import spark.implicits._
    if (affected.isEmpty)
      return Seq.empty[(String, Long, Long)].toDF("__d", "n_before", "n_after")
    val affectedSlice = store.filter(col("__d").isin(affected: _*))
    // materialized BEFORE the swap — a lazy plan here would chase the
    // replaced files after the overwrite
    val before = affectedSlice.groupBy(col("__d").cast("string").as("__d"))
      .agg(count(lit(1)).as("n_before")).localCheckpoint()
    val kept = affectedSlice.filter(!col(keyCol).isin(keys: _*))
      .localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      kept.write.mode("overwrite").partitionBy("__d").parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // drop the session's cached file listing for the store — readers opened
    // before the swap would otherwise chase the replaced files
    spark.catalog.refreshByPath(path)
    before.join(
      kept.groupBy(col("__d").cast("string").as("__d"))
        .agg(count(lit(1)).as("n_after")),
      Seq("__d"), "left")
      .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
  }

  /** Driver demo: stage events date-partitioned, forget a deterministic
    * user set (user_id % 97 = 13), report per-partition before/after for
    * the rewritten partitions. Accounting is reproducible from the events
    * table alone, so the oracle replays it in SQL.
    */
  def forgetDemo(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("forget").toString
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
    Tables.writeDatePartitioned(ev, "ts_us", s"$root/store")
    val keys = ev.select("user_id").filter(col("user_id") % 97 === 13)
      .distinct().collect().map(_.getLong(0)).toSeq
    forgetKeys(spark, s"$root/store", "user_id", keys)
      .select(col("__d").as("event_date"), col("n_before"), col("n_after"))
  }

  /** #234 Crypto-shredding — the O(1)-per-user forget that needs NO data
    * rewrite (the complement of [[forgetKeys]]'s physical rewrite, and
    * what a 100 TB immutable store actually deploys): sensitive values
    * are encrypted at rest under a PER-USER key held in a tiny key
    * registry; forgetting a user deletes one registry row, and every
    * ciphertext they ever produced becomes undecryptable garbage in
    * place. AES via Spark's built-in codegen'd `aes_encrypt`/
    * `try_aes_decrypt`; the read path is a broadcast key join + row-local
    * decrypt, and `try_` turns keyless ciphertexts into NULLs, not jobs
    * that die.
    */
  def cryptoShred(store: DataFrame, keyReg: DataFrame): DataFrame =
    store.join(broadcast(keyReg), Seq("user_id"), "left")
      .withColumn("plain",
        expr("try_aes_decrypt(cipher, k, 'ECB')").cast("string"))
      .withColumn("readable", col("k").isNotNull && col("plain").isNotNull)

  /** Driver demo: encrypt event values under per-user keys, shred
    * user_id % 13 = 3, report per-type readable/shredded mass. The
    * aggregate equals a plain filtered aggregate of the source — the
    * oracle replays it WITHOUT AES, which proves the encrypt→shred→
    * decrypt round trip preserved every surviving value exactly.
    */
  def cryptoShredDemo(spark: SparkSession, dir: String): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(12, 2)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    // 16-byte per-user key derived deterministically; a real deployment
    // uses random keys — derivation only makes the demo replayable
    val userKey = expr("CAST(unhex(md5(CAST(user_id AS STRING))) AS BINARY)")
    val store = ev
      .withColumn("cipher",
        expr("aes_encrypt(CAST(value AS STRING), " +
          "CAST(unhex(md5(CAST(user_id AS STRING))) AS BINARY), 'ECB')"))
      .drop("value")
    val keyReg = ev.select("user_id").distinct()
      .filter(col("user_id") % 13 =!= 3)
      .withColumn("k", userKey)
    cryptoShred(store, keyReg)
      .groupBy("event_type")
      .agg(sum(when(col("readable"), 1L).otherwise(0L)).as("n_readable"),
        sum(when(!col("readable"), 1L).otherwise(0L)).as("n_shredded"),
        round(sum(when(col("readable"), col("plain").cast(d))), 2)
          .cast("double").as("readable_value"))
  }

  /** #299 Data-subject access report (the GDPR Art. 15 counterpart of the
    * Art. 17 [[forgetKeys]]): for each subject key, enumerate WHAT the
    * warehouse holds about them across every table reachable from the
    * key — row counts and the held time range per table. Subjects here
    * are a deterministic key slice (c_custkey % 100 == 7 — in production
    * the request list); the subject set BROADCASTS to each fact table
    * (semi-join shape: facts never shuffle on their own bulk), and
    * lineitem is reached through its orders foreign key, so the report
    * costs one broadcast-pruned scan per table at any warehouse size.
    */
  def dsarExport(spark: SparkSession, dir: String): DataFrame = {
    val subjects = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 100 === 7)
      .select(col("c_custkey").as("subject"))
    val custRows = Tables.customer(spark, dir)
      .join(broadcast(subjects), col("c_custkey") === col("subject"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
        lit(null).cast("long").as("first_us"), lit(null).cast("long").as("last_us"))
      .withColumn("tbl", lit("customer"))
    val ordRows = Tables.orders(spark, dir)
      .join(broadcast(subjects), col("o_custkey") === col("subject"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
        min(unix_micros(col("o_orderdate").cast("timestamp"))).as("first_us"),
        max(unix_micros(col("o_orderdate").cast("timestamp"))).as("last_us"))
      .withColumn("tbl", lit("orders"))
    val subjOrders = Tables.orders(spark, dir)
      .join(broadcast(subjects), col("o_custkey") === col("subject"))
      .select(col("o_orderkey").as("l_orderkey"), col("subject"))
    val liRows = Tables.lineitem(spark, dir)
      .join(subjOrders, "l_orderkey")
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
        min(unix_micros(col("l_shipdate").cast("timestamp"))).as("first_us"),
        max(unix_micros(col("l_shipdate").cast("timestamp"))).as("last_us"))
      .withColumn("tbl", lit("lineitem"))
    custRows.unionByName(ordRows).unionByName(liRows)
      .select("subject", "tbl", "n_rows", "first_us", "last_us")
  }

  /** #401 `cdc_forget_cascade` — the erasure EXECUTION PLAN [[dsarExport]]
    * 's holdings report feeds: for the same subject set, the FK-cascade
    * order (children before parents — lineitem → orders → customer, so no
    * orphaned references survive mid-run) with per-table affected-row
    * counts, distinct subjects touched, and the share of each table the
    * rewrite will churn (the partition-rewrite cost driver for
    * [[forgetKeys]]). The FK closure reuses the subject-orders broadcast;
    * table totals come from the same scans' aggregates — one pass per
    * table, subject set always broadcast.
    */
  def forgetCascade(spark: SparkSession, dir: String): DataFrame = {
    val subjects = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 100 === 7)
      .select(col("c_custkey").as("subject"))
    def leg(df: org.apache.spark.sql.DataFrame, joinKey: String,
        tbl: String, depth: Int, order: Int): org.apache.spark.sql.DataFrame = {
      val total = df.count()
      df.join(broadcast(subjects), col(joinKey) === col("subject"))
        .agg(count(lit(1)).as("n_rows_affected"),
          countDistinct(col("subject")).as("n_subjects"))
        .selectExpr(s"'$tbl' AS tbl", s"CAST($depth AS BIGINT) AS fk_depth",
          s"CAST($order AS BIGINT) AS delete_order",
          "n_rows_affected", "n_subjects",
          s"n_rows_affected * 1000000 DIV ${total}L AS churn_ppm")
    }
    val subjOrders = Tables.orders(spark, dir)
      .join(broadcast(subjects), col("o_custkey") === col("subject"))
      .select(col("o_orderkey"), col("subject"))
    val liLeg = {
      val li = Tables.lineitem(spark, dir).select("l_orderkey")
      val total = li.count()
      li.join(broadcast(subjOrders), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_rows_affected"),
          countDistinct(col("subject")).as("n_subjects"))
        .selectExpr("'lineitem' AS tbl", "CAST(2 AS BIGINT) AS fk_depth",
          "CAST(1 AS BIGINT) AS delete_order",
          "n_rows_affected", "n_subjects",
          s"n_rows_affected * 1000000 DIV ${total}L AS churn_ppm")
    }
    liLeg
      .unionByName(leg(Tables.orders(spark, dir).select("o_custkey"),
        "o_custkey", "orders", 1, 2))
      .unionByName(leg(Tables.customer(spark, dir).select("c_custkey"),
        "c_custkey", "customer", 0, 3))
  }
}
