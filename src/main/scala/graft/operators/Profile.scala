package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** One-pass per-column table profiling — the Deequ-style onboarding audit
  * a 500-table CDC registry runs before enabling a table (reference:
  * table_manager.py discovers row counts only; real onboarding needs
  * nullability, cardinality, and shape per column).
  *
  * ONE aggregation over the table produces every column's row count, null
  * count, exact distinct count, and (for strings) length extrema; the
  * single summary row then unpivots via `stack` — the same
  * aggregate-then-stack shape as the expectations audit. Multiple exact
  * COUNT(DISTINCT) columns plan as Spark's Expand (input rows × columns
  * before partial aggregation, still ONE shuffle); at 100 TB swap
  * `approx_count_distinct` in via `exact = false` and the Expand
  * disappears — exact is the default so the DuckDB oracle can match
  * hash-for-hash.
  */
object Profile {

  def tableProfile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg.as(s"${c}__distinct")) ++
      (df.schema(c).dataType match {
        case StringType => Seq(
          min(length(col(c))).cast("long").as(s"${c}__minlen"),
          max(length(col(c))).cast("long").as(s"${c}__maxlen"))
        case _ => Seq(
          lit(null).cast("long").as(s"${c}__minlen"),
          lit(null).cast("long").as(s"${c}__maxlen"))
      })
    }
    val summary = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__minlen`, `${c}__maxlen`"
    ).mkString(", ")
    summary.selectExpr("__n_rows AS n_rows",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_len, max_len)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_len", "max_len")
  }

  /** #218 Exact pre-flight join-cardinality profile: the output size of
    * `left ⋈ right` on an equi-key, priced WITHOUT executing the join.
    * Each side reduces to a per-key count profile (key-cardinality-sized,
    * not data-sized); `sum(cl·cr)` over the profile join is the exact
    * output row count and `max(cl·cr)` the single hottest key — the two
    * numbers the broadcast / salting / skew-hint decision needs before
    * committing a 100 TB × 100 TB shuffle.
    */
  def joinCardinalityOn(left: DataFrame, leftKey: String,
                        right: DataFrame, rightKey: String): DataFrame = {
    val lp = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val rp = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    // ONE full-outer profile join feeds every statistic: each side's
    // aggregate is consumed exactly once (no branch recompute), and the
    // join key equals the groupBy key so the join adds NO exchange beyond
    // the two profile shuffles
    lp.join(rp, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(col("cl")), lit(0L)).cast("long").as("n_left"),
        coalesce(sum(col("cr")), lit(0L)).cast("long").as("n_right"),
        count(col("cl")).as("distinct_left_keys"),
        count(col("cr")).as("distinct_right_keys"),
        sum(when(col("cl").isNotNull && col("cr").isNotNull, 1L).otherwise(0L))
          .as("n_matching_keys"),
        coalesce(sum(col("cl") * col("cr")), lit(0L)).cast("long").as("predicted_rows"),
        coalesce(max(col("cl") * col("cr")), lit(0L)).cast("long").as("max_key_rows"))
      .select("n_left", "n_right", "distinct_left_keys", "distinct_right_keys",
        "n_matching_keys", "predicted_rows", "max_key_rows")
  }

  /** Benford's-law first-significant-digit expectation, parts-per-million:
    * floor(log10(1 + 1/d) · 10⁶) for d = 1..9. Hard integer constants —
    * the same literals appear in the oracle SQL, so no engine ever
    * evaluates a log.
    */
  final val BenfordPpm: Seq[(String, Long)] = Seq(
    "1" -> 301029L, "2" -> 176091L, "3" -> 124938L, "4" -> 96910L,
    "5" -> 79181L, "6" -> 66946L, "7" -> 57991L, "8" -> 51152L, "9" -> 45757L)

  /** #270 Benford first-digit audit: the fraud/synthetic-data smoke test —
    * naturally-occurring monetary amounts follow log-uniform leading
    * digits; fabricated or clamped columns don't. The digit is taken from
    * the integer cents' decimal string (positive amounts), counted in ONE
    * aggregation per column, and compared against the hard Benford ppm
    * constants as exact integer deviations. At 100 TB this is a map-side
    * partial count into a 9-row frame per column — nothing scales with
    * data but the scan.
    */
  def benfordAudit(df: DataFrame, colLabel: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = BenfordPpm.toDF("digit", "exp_ppm")
    val digits = df
      .select(expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("substring(CAST(cents AS STRING), 1, 1)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("n_total"))
    expected.join(broadcast(digits), Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .join(broadcast(total))
      .select(lit(colLabel).as("col_label"), col("digit"), col("n"),
        expr("n * 1000000 DIV n_total").as("obs_ppm"), col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** DuckDB oracle text for one [[benfordAudit]] leg, generated from the
    * same [[BenfordPpm]] constants so the two engines cannot drift.
    */
  def benfordOracle(legs: Seq[(String, String)]): String = {
    val values = BenfordPpm.map { case (d, p) => s"('$d', $p)" }.mkString(", ")
    val ctes = legs.zipWithIndex.map { case ((table, valueCol), i) =>
      s"""d$i AS (SELECT substring(CAST(cents AS VARCHAR), 1, 1) AS digit,
         |        count(*) AS n
         |  FROM (SELECT CAST(round($valueCol * 100) AS BIGINT) AS cents FROM $table
         |        WHERE CAST(round($valueCol * 100) AS BIGINT) > 0)
         |  GROUP BY 1),
         |t$i AS (SELECT sum(n) AS n_total FROM d$i)""".stripMargin
    }.mkString(",\n")
    val selects = legs.zipWithIndex.map { case ((_, valueCol), i) =>
      s"""SELECT '$valueCol' AS col_label, expected.digit,
         |  CAST(COALESCE(n, 0) AS BIGINT) AS n,
         |  CAST(COALESCE(n, 0) * 1000000 // n_total AS BIGINT) AS obs_ppm,
         |  CAST(exp_ppm AS BIGINT) AS exp_ppm,
         |  CAST(COALESCE(n, 0) * 1000000 // n_total - exp_ppm AS BIGINT) AS dev_ppm
         |FROM expected LEFT JOIN d$i ON expected.digit = d$i.digit CROSS JOIN t$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH expected(digit, exp_ppm) AS (VALUES $values),\n$ctes\n$selects"
  }

  /** DuckDB oracle text for one [[fdAudit]] rule. */
  def fdOracleLeg(table: String, a: String, b: String): String =
    s"""SELECT '$table' AS table_name, '$a' AS determinant, '$b' AS dependent,
       |  count(*) AS n_groups,
       |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
       |  CAST(sum(CASE WHEN nd > 1 THEN nr ELSE 0 END) AS BIGINT) AS violating_rows,
       |  CAST(CASE WHEN count(*) = 0 THEN 0
       |    ELSE sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
       |    END AS BIGINT) AS violation_ppm
       |FROM (SELECT $a, count(DISTINCT $b) AS nd, count(*) AS nr
       |      FROM $table GROUP BY 1)""".stripMargin

  /** #271 Functional-dependency audit: for each candidate A→B rule, how
    * many determinant groups carry more than one distinct dependent value
    * (and how many rows sit in those groups). The discovery primitive
    * under normalization checks, "is this column derivable" pruning, and
    * CDC key-sanity gates. One countDistinct aggregation per rule, each
    * folding to a single row — the per-rule frames never leave the
    * key-cardinality scale.
    */
  def fdAudit(df: DataFrame, table: String, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (a, b) =>
      df.groupBy(col(a))
        .agg(countDistinct(col(b)).as("nd"), count(lit(1)).as("nr"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("violating_groups"),
          sum(when(col("nd") > 1, col("nr")).otherwise(0L)).as("violating_rows"))
        .select(lit(table).as("table_name"), lit(a).as("determinant"),
          lit(b).as("dependent"), col("n_groups"),
          col("violating_groups"),
          coalesce(col("violating_rows"), lit(0L)).as("violating_rows"),
          expr("CASE WHEN n_groups = 0 THEN 0 " +
            "ELSE violating_groups * 1000000 DIV n_groups END").as("violation_ppm"))
    }.reduce(_ unionByName _)

  /** #244 Join strategy advisor: the [[joinCardinalityOn]] numbers turned
    * into the decision a planner (or an engineer staring at a 100 TB
    * shuffle) actually makes — broadcast the smaller side when it fits,
    * flag skew-salting when one key dominates, otherwise a plain
    * shuffled hash/sort-merge join. Thresholds are explicit parameters,
    * not magic; the row estimate used for the broadcast test is exact.
    */
  def joinAdvisor(left: DataFrame, leftKey: String,
                  right: DataFrame, rightKey: String,
                  broadcastMaxRows: Long = 1000000L,
                  skewRatioE2: Long = 2000L): DataFrame =
    joinCardinalityOn(left, leftKey, right, rightKey)
      .withColumn("skew_ratio_e2",
        expr("CASE WHEN predicted_rows = 0 THEN 0 " +
          "ELSE max_key_rows * 100 * n_matching_keys DIV predicted_rows END"))
      .withColumn("strategy",
        when(col("n_right") <= broadcastMaxRows, "broadcast_right")
          .when(col("n_left") <= broadcastMaxRows, "broadcast_left")
          .when(col("skew_ratio_e2") >= skewRatioE2, "shuffle_salted")
          .otherwise("shuffle_hash"))

  /** #318 Sort-order layout advisor: for each candidate sort key, the
    * EXACT number of value runs each payload column would have if the
    * table were rewritten sorted by that key — the quantity that decides
    * RLE/dictionary compressibility and data-skipping effectiveness of a
    * layout rewrite ([[graft.Tables.compact]] / Layout.mortonLayout pick
    * the order; this measures what each order buys). avg_run_e2 =
    * rows×100/runs: a payload at 100 (run length 1) gains nothing; large
    * values mean long constant stretches → tiny RLE output + tight
    * zone maps.
    *
    * Distributed shape: ONE range-repartition + local sort + ONE
    * mapPartitions pass per candidate (exactly the shuffle/sort the
    * rewrite itself would do — no global window, no second read of the
    * sorted data). Each partition emits one bounded stat row (adjacent
    * transition counts + its first/last payload tuple); the driver
    * reconciles the ≤P cross-partition seams — bounded by partition
    * COUNT, never data size. The tiebreak must make the PAYLOAD
    * assignment deterministic: either a total order, or (when the table
    * carries duplicate keys) include the payload columns themselves in
    * the tiebreak — equal-key rows then have equal payloads and the run
    * count is well-defined. At 100 TB run it on a contiguous block
    * sample instead of the full table — the registered `tbl_sort_advisor`
    * does exactly that (SparkEntry.SortAdvisorBlockKeyCap: a fixed,
    * min/max-prunable key-range block, exact at oracle SFs; UtilSpec pins
    * block-vs-exact ranking agreement).
    */
  def sortRunsAdvisor(df: DataFrame, candidates: Seq[Seq[String]],
      payloads: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    def enc(v: Any): String = if (v == null) null else v.toString
    def same(a: Any, b: Any): Boolean =
      (a == null && b == null) || (a != null && a == b)
    // the candidate jobs are INDEPENDENT (each is its own range-shuffle +
    // stats pass over the same projection), so they submit CONCURRENTLY
    // from a candidate-sized thread pool over one shared cached
    // projection — the scheduler interleaves their sampling/shuffle/stat
    // stages instead of serializing ~candidate-count wall-clock
    val allNeeded =
      (candidates.flatten ++ tiebreak ++ payloads).distinct
    val base = df.select(allNeeded.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.foreach(_ => ()) // materialize ONCE, before the fork (no cache races)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, candidates.length))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val out = try {
      Await.result(Future.sequence(candidates.map { cand => Future {
      val orderCols = (cand ++ tiebreak).distinct
      val needed = (orderCols ++ payloads).distinct
      val parts = spark.sessionState.conf.numShufflePartitions
      val pidx = payloads.map(needed.indexOf).toArray
      val k = pidx.length
      // stats: (pid, n, perPayloadChanges, firstEnc, lastEnc) — one element
      // per non-empty partition, gathered in a single job
      val stats = base.select(needed.map(col): _*)
        .repartitionByRange(parts, orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*)
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val chg = new Array[Long](k)
          val first = new Array[Any](k)
          val last = new Array[Any](k)
          var n = 0L
          it.foreach { row =>
            var i = 0
            while (i < k) {
              val v = row.get(pidx(i))
              if (n == 0L) first(i) = v
              else if (!same(last(i), v)) chg(i) += 1L
              last(i) = v
              i += 1
            }
            n += 1L
          }
          if (n == 0L) Iterator.empty
          else Iterator.single((pid, n, chg.toSeq,
            first.map(enc).toSeq, last.map(enc).toSeq))
        }.collect().sortBy(_._1)
      val nRows = stats.map(_._2).sum
      val seamChg = payloads.indices.map { i =>
        stats.toSeq.sliding(2).count {
          case Seq(a, b) =>
            val prev = a._5(i); val next = b._4(i)
            !((prev == null && next == null) || (prev != null && prev == next))
          case _ => false
        }.toLong
      }
      payloads.zipWithIndex.map { case (p, i) =>
        val runs =
          if (nRows == 0L) 0L
          else 1L + stats.map(_._3(i)).sum + seamChg(i)
        (cand.mkString(","), p, nRows, runs,
          if (runs == 0L) 0L else nRows * 100L / runs)
      }
      }}), Duration.Inf).flatten
    } finally {
      pool.shutdown()
      base.unpersist(blocking = false)
    }
    import spark.implicits._
    out.toDF("sort_key", "payload", "n_rows", "n_runs", "avg_run_e2")
  }

  /** DuckDB oracle for [[sortRunsAdvisor]]: the per-candidate global
    * window formulation (fine at oracle SF; the Spark side exists
    * precisely because this window is single-partition at scale).
    */
  def sortRunsOracle(table: String, candidates: Seq[Seq[String]],
      payloads: Seq[String], tiebreak: Seq[String]): String =
    candidates.map { cand =>
      val ord = (cand ++ tiebreak).distinct.mkString(", ")
      val lags = (payloads.map(p => s"lag($p) OVER (ORDER BY $ord) AS __l_$p") :+
        s"lag(1) OVER (ORDER BY $ord) AS __hp").mkString(", ")
      val runs = payloads.map(p =>
        s"1 + sum(CASE WHEN __hp IS NULL THEN 0 WHEN $p IS NOT DISTINCT FROM __l_$p " +
          s"THEN 0 ELSE 1 END) AS __r_$p").mkString(", ")
      val legs = payloads.map(p =>
        s"SELECT '${cand.mkString(",")}' AS sort_key, '$p' AS payload, " +
          s"CAST(n_rows AS BIGINT) AS n_rows, CAST(__r_$p AS BIGINT) AS n_runs, " +
          s"CAST(n_rows * 100 // __r_$p AS BIGINT) AS avg_run_e2 FROM a_${cand.mkString("_")}")
      s"""c_${cand.mkString("_")} AS (SELECT ${payloads.mkString(", ")}, $lags FROM $table),
         |a_${cand.mkString("_")} AS (SELECT count(*) AS n_rows, $runs FROM c_${cand.mkString("_")})
         |""".stripMargin -> legs
    } match {
      case ctesAndLegs =>
        val ctes = ctesAndLegs.map(_._1).mkString(",\n")
        val legs = ctesAndLegs.flatMap(_._2).mkString("\nUNION ALL\n")
        s"WITH $ctes\n$legs"
    }

  /** #383 `tbl_column_stats` — ANALYZE-TABLE-style per-column statistics
    * (the numbers a cost-based optimizer and every data-quality dashboard
    * key off): row count, null count, EXACT NDV, lexicographic min/max
    * over a canonical string form, and mean canonical width ×100. Columns
    * are first rendered to engine-stable canonical strings (integers
    * verbatim, money through DECIMAL(12,2) — never raw double repr, which
    * diverges cross-engine at 1e7 — timestamps as yyyy-MM-dd), then
    * UNPIVOTED map-side (`stack`) so the whole profile is ONE shuffle
    * with `n_columns` keys — the shape that survives a 100 TB scan,
    * unlike one count-distinct job per column. Min/max are over the
    * canonical form and therefore lexicographic — documented, and what a
    * prefix-index/zonemap over the rendered form would see.
    */
  def tableColumnStats(df: DataFrame): DataFrame = {
    val cols = df.columns
    val unpiv = df.select(expr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', `$c`").mkString(", ") + ") AS (col_name, v)"))
    unpiv.groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("ndv"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"),
        sum(length(col("v")).cast("long")).as("tot_len"))
      .selectExpr("col_name", "n_rows", "n_nulls", "ndv", "min_val", "max_val",
        "CASE WHEN n_rows - n_nulls > 0 " +
          "THEN tot_len * 100 DIV (n_rows - n_nulls) ELSE 0 END AS avg_len_e2")
  }

  /** #383 Registered entry: the orders table through the canonical
    * rendering (ints verbatim, price via DECIMAL, date as yyyy-MM-dd). */
  def tableColumnStats(spark: SparkSession, dir: String): DataFrame =
    tableColumnStats(graft.Tables.orders(spark, dir).selectExpr(
      "CAST(o_orderkey AS STRING) AS o_orderkey",
      "CAST(o_custkey AS STRING) AS o_custkey",
      "o_orderstatus",
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING) AS o_totalprice",
      "date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate",
      "o_orderpriority"))
}
