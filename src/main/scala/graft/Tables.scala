package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet loaders for the driver-generated tables at /root/testdata/sf*.
  *
  * Mirrors the reference's TPC-H data model
  * (reference: scripts/setup_tpch_database.py:84-245) plus the CDC stream
  * analog `events` and the LLM-pipeline tables `documents`/`embeddings`.
  *
  * Scale note: plain `spark.read.parquet` keeps the scan pushdown-able
  * (PushedFilters / ReadSchema reach the file source); at 100 TB these
  * tables would be directory-partitioned and the same loaders apply.
  */
object Tables {

  /** events.parquet has shipped with `ts` as both raw INT64 nanoseconds
    * (the TIMESTAMP(NANOS) files Spark's parquet reader rejects with
    * [PARQUET_TYPE_ILLEGAL] are written this way) and TIMESTAMP(MICROS).
    * Forcing INT64 reads the raw physical value either way; which unit
    * that value carries is decided from the file's own logical type (one
    * driver-side footer read), and micros are lifted ×1000 to the
    * schema's nanosecond contract. Downstream `ts DIV 1000` then matches
    * DuckDB's `epoch_us(ts)` truncation exactly — keeping the oracle
    * comparable regardless of which generator wrote the file.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanoseconds since epoch (see above)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Cheap corpus-snapshot fingerprint: a hash over the sorted
    * (relative path, size, mtime) listing of every regular file under
    * `dir`. The in-process memo caches (near-dup pair/cluster artifacts,
    * kNN graph, PQ/IVF codebooks, CC base labels) key on this alongside
    * the path, so a corpus REGENERATED under the same directory — the
    * round-4 testdata-regeneration incident, or any same-JVM append —
    * rebuilds its artifacts instead of silently serving stale ones.
    * Driver-side directory walk only (no data read): microseconds on a
    * table directory, and at production scale a store's manifest/ETag
    * serves the same role.
    */
  def snapshotFingerprint(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dir)
    if (!Files.exists(root)) return "absent"
    val s = Files.walk(root)
    val listing =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(p => s"${root.relativize(p)}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}")
          .toSeq.sorted.mkString("\n")
      } finally s.close()
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(listing).toLong & 0xffffffffL)
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$dir/events.parquet"
    val tsIsMicros = spark.read.parquet(path).schema
      .find(_.name == "ts")
      .exists(f => f.dataType == TimestampType || f.dataType == TimestampNTZType)
    val raw = spark.read.schema(eventsSchema).parquet(path)
    if (tsIsMicros) raw.withColumn("ts", col("ts") * 1000L) else raw
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view, making the whole surface
    * available to `spark.sql` — combined with `GraftSession.attach` the
    * custom functions compose with plain SQL over these views (the
    * "switch from the reference" entry point for SQL-first users).
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
    events(spark, dir).createOrReplaceTempView("events")
  }

  /** CDC envelopes arrive as JSON lines off the wire in the reference's
    * Debezium variant (debezium-approach/notebooks/dlt_cdc_pipeline.py:
    * 112-140) — same schema contract, different container. `multiLine`
    * stays off so the reader splits files by line and scales per-block.
    */
  def eventsFromJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsSchema).json(path)

  /** CSV flavor of the same envelope (header, explicit schema — never
    * inferSchema on a 100 TB directory).
    */
  def eventsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsSchema).option("header", "true").csv(path)

  /** Date-partitioned parquet write (reference partitions its Delta targets
    * by date parts, cdc_500_tables_streaming.py:285). Partition column count
    * stays low-cardinality (day precision) so the file count scales with
    * days, not keys.
    */
  def writeDatePartitioned(df: DataFrame, tsUsCol: String, outPath: String): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("__d", to_date(timestamp_micros(col(tsUsCol))))
      .write.mode("overwrite").partitionBy("__d").parquet(outPath)
  }

  /** Small-file compaction: rewrite `path` into ≈`targetFileMB` files —
    * the maintenance job every micro-batch CDC sink needs (each trigger
    * writes a handful of small files; a month later the table is a
    * million of them and open/footers dominate scan time). File count
    * derives from actual on-disk bytes; the rewrite stages to a temp dir
    * and swaps, same pattern as the upsert sink. Returns the new file
    * count.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128): Int = {
    // normalize first: a trailing slash would make the staging dir a CHILD
    // of the table and the swap would destroy the fresh copy
    val p = new org.apache.hadoop.fs.Path(path)
    // the PATH's filesystem, not the default one — compacting an object
    // store table from a cluster whose default FS is HDFS must hit the store
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partitioned = fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    require(!partitioned,
      s"$path is hive-partitioned; compact would flatten the layout — compact per partition instead")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetFileMB * 1024L * 1024L)).toInt)
    val staging = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__compacting")
    val retired = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__retired")
    spark.read.parquet(p.toString).repartition(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    // swap old ASIDE first: a crash at any point leaves either the original
    // or the compacted copy addressable, never neither
    fs.delete(retired, true)
    require(fs.rename(p, retired), s"could not retire $p")
    require(fs.rename(staging, p), s"could not promote $staging to $p")
    fs.delete(retired, true)
    nFiles
  }

  /** Per-partition compaction of a hive-partitioned table: each
    * `col=value` leaf directory compacts independently (so the layout —
    * and partition pruning — survives), and a partition being swapped
    * never blocks readers of the others. Returns (partition, newFiles)
    * per leaf. Sequential over partitions here; a production run fans the
    * per-partition jobs out, which is safe because they touch disjoint
    * directories.
    */
  def compactPartitioned(spark: SparkSession, path: String,
      targetFileMB: Int = 128): Seq[(String, Int)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(s => s.getPath.getName ->
        compact(spark, s.getPath.toString, targetFileMB))
  }

  /** Retention sweep — the VACUUM analog (reference:
    * unity_catalog_cdc_demo.py:605-624 runs VACUUM after OPTIMIZE). The
    * generation-dir pattern used throughout (registry `gen=N` checkpoints,
    * medallion `batch_id=N` DLQ/quarantine drops, `__retired` compaction
    * leftovers) accumulates forever without it — at 100 TB the retired
    * copies dwarf the live table within weeks.
    *
    * Deletes, under `path`:
    *  - numbered generation dirs (`prefix=N` for any single prefix) beyond
    *    the newest `keepLast` — the CURRENT generation is never touched,
    *    so concurrent readers of the newest snapshot are safe mid-sweep;
    *  - crash leftovers: `*__retired` and `*_staging`/`*__compacting` dirs
    *    (complete tables were already promoted; these are the swapped-out
    *    or abandoned copies).
    *
    * Driver-side FS metadata ops only — no data is read. Returns the
    * deleted paths (relative names) for audit logging.
    */
  def retentionSweep(spark: SparkSession, path: String,
      keepLast: Int = 2): Seq[String] = {
    require(keepLast >= 1, "retentionSweep must keep at least the current generation")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val children = fs.listStatus(root).toIndexedSeq.filter(_.isDirectory)
    val genPat = "([A-Za-z_]+)=([0-9]+)".r
    val generations = children.flatMap(s => s.getPath.getName match {
      case genPat(prefix, n) => Some((prefix, n.toLong, s.getPath))
      case _ => None
    })
    val expiredGens = generations.groupBy(_._1).values.flatMap { gens =>
      gens.sortBy(-_._2).drop(keepLast)
    }.map(_._3).toSeq
    val leftovers = children.map(_.getPath).filter { p =>
      val n = p.getName
      n.endsWith("__retired") || n.endsWith("_staging") || n.endsWith("__compacting")
    }
    (expiredGens ++ leftovers).map { p =>
      fs.delete(p, true)
      p.getName
    }.sorted
  }

  /** #238 Write-Audit-Publish: stage the new table version OUT OF BAND,
    * run audits against the STAGED copy, and only then atomically promote
    * it — readers never see an unaudited row, and a failing audit (or a
    * crash at any step) leaves the previous version untouched and
    * addressable (reference analog: the DLT expectations gate only
    * quarantines rows; WAP gates the whole publish, which is what a
    * 100 TB gold table actually wants for backfills). Same
    * retire-then-promote swap discipline as [[compact]]; the `__retired`
    * leftover is reclaimed by [[retentionSweep]].
    *
    * Returns true when published; false when an audit rejected the
    * staged data (staging is cleaned up, the live table is untouched).
    */
  def writeAuditPublish(spark: SparkSession, df: DataFrame, path: String,
      audits: Seq[DataFrame => Boolean]): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "_staging")
    val retired = new org.apache.hadoop.fs.Path(p.getParent, p.getName + "__retired")
    df.write.mode("overwrite").parquet(staging.toString)
    val staged = spark.read.parquet(staging.toString)
    val ok = audits.forall(a => a(staged))
    if (!ok) {
      fs.delete(staging, true)
      false
    } else {
      fs.delete(retired, true)
      if (fs.exists(p)) require(fs.rename(p, retired), s"could not retire $p")
      require(fs.rename(staging, p), s"could not promote $staging to $p")
      fs.delete(retired, true)
      spark.catalog.refreshByPath(path)
      true
    }
  }

  /** #222 Small-file / size-skew audit — the layout health check that
    * decides when [[compact]] runs (reference:
    * unity_catalog_cdc_demo.py:605-624 runs OPTIMIZE blind on a schedule;
    * this makes the trigger a measurement). One row per leaf (the table
    * itself, or each `col=value` partition): file count, total size, the
    * largest file, and how many files sit under the small-file threshold
    * — `small_files ≈ n_files` means the partition is paying per-file
    * open/footer/scheduling overhead on every scan.
    *
    * FS-METADATA only (listing, no data pages). The listing is O(files)
    * driver work — the same cost every parquet scan's file index pays, so
    * anything scannable is auditable.
    */
  def fileAudit(spark: SparkSession, path: String,
      smallFileMB: Int = 16): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val smallBytes = smallFileMB * 1024L * 1024L
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val s = it.next()
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) buf += s
      }
      buf.toSeq
    }
    val status = fs.getFileStatus(root)
    val leaves: Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])] =
      if (!status.isDirectory) Seq(root.getName -> Seq(status))
      else {
        val parts = fs.listStatus(root).toIndexedSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        if (parts.nonEmpty) parts.map(s => s.getPath.getName -> dataFiles(s.getPath))
        else Seq("." -> dataFiles(root))
      }
    val rows = leaves.map { case (leaf, files) =>
      val sizes = files.map(_.getLen)
      (leaf, sizes.size.toLong,
        math.round(sizes.sum / 1048576.0 * 100) / 100.0,
        math.round((if (sizes.isEmpty) 0L else sizes.max) / 1048576.0 * 100) / 100.0,
        sizes.count(_ < smallBytes).toLong)
    }
    import spark.implicits._
    rows.toDF("leaf", "n_files", "total_mb", "max_file_mb", "small_files")
      .orderBy("leaf")
  }

  /** #332 Compaction PLAN — the dry-run between [[fileAudit]] (detect)
    * and [[compact]] (execute): deterministic first-fit-decreasing bin
    * pack of the table's data files into target-size groups, so an
    * operator can see exactly which files merge, how full each output
    * lands, and how many rewrite tasks the job needs BEFORE burning the
    * I/O. Files already at/above target stay singleton groups (rewriting
    * them buys nothing). Runs on file METADATA only — the listing is
    * bounded by file count, no data pages are read.
    */
  def compactionPlan(spark: SparkSession, path: String,
      targetFileMB: Int = 128): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = targetFileMB * 1024L * 1024L
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) files += ((n, s.getLen))
    }
    // FFD: size desc (name tiebreak for determinism), first group with room
    val sorted = files.sortBy { case (n, sz) => (-sz, n) }
    val groups = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[(String, Long)], Long)]
    sorted.foreach { case (n, sz) =>
      val slot =
        if (sz >= target) -1 // oversized files stay put
        else groups.indexWhere { case (_, used) => used + sz <= target }
      if (slot >= 0) {
        val (buf, used) = groups(slot)
        buf += ((n, sz)); groups(slot) = (buf, used + sz)
      } else {
        groups += ((scala.collection.mutable.ArrayBuffer((n, sz)), sz))
      }
    }
    val rows = groups.zipWithIndex.map { case ((buf, used), gid) =>
      (gid.toLong, buf.length.toLong, used,
        used * 10000L / target, // fill as e4 fraction of target
        buf.map(_._1).sorted.mkString(","))
    }
    import spark.implicits._
    rows.toSeq.toDF("group_id", "n_files", "group_bytes", "fill_e4", "files")
  }

  private val compactDemoMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** Demo: lineitem deliberately shattered into 12 small files (memoized
    * per corpus snapshot), then planned against a 4 MB target.
    */
  def compactionPlanDemo(spark: SparkSession, dir: String): DataFrame = {
    val path = compactDemoMemo.getOrElseUpdate(
      (dir, snapshotFingerprint(dir)), {
      val p = java.nio.file.Files.createTempDirectory("cplan").toString + "/t"
      lineitem(spark, dir).repartition(12).write.parquet(p)
      p
    })
    compactionPlan(spark, path, targetFileMB = 4)
  }
}
