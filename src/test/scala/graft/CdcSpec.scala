package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.cdc.Cdc

/** Semantic checks of the CDC apply-changes operators. */
class CdcSpec extends SparkSpec {

  test("scd1 keeps one row per live user and drops deleted users") {
    val cur = Cdc.currentScd1(spark, sf).cache()
    assert(cur.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // users whose latest event is a DELETE must be absent
    val log = Cdc.log(spark, sf)
    val latest = log.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("seq_us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
    val deleted = latest.filter(col("operation") === "DELETE").select("user_id")
    assert(cur.join(deleted, "user_id").count() == 0)
    // live users all present
    val live = latest.filter(col("operation") =!= "DELETE").count()
    assert(cur.count() == live)
  }

  test("scd2 history: exactly one current row per user, contiguous intervals") {
    val h = Cdc.scd2History(spark, sf).cache()
    val perUser = h.groupBy("user_id")
      .agg(count(when(col("is_current"), 1)).as("n_current"),
        count(lit(1)).as("n_rows"))
    assert(perUser.filter(col("n_current") =!= 1).count() == 0)
    // each non-current row's valid_to equals the next row's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us")
    val gaps = h.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to_us") =!= col("next_from"))
    assert(gaps.count() == 0)
  }

  test("exactly-once dedup restores original cardinality") {
    val deduped = Cdc.dedupExactlyOnce(spark, sf).cache()
    val original = Tables.events(spark, sf).count()
    assert(deduped.count() == original)
    assert(deduped.filter(col("deliveries") > 2 || col("deliveries") < 1).count() == 0)
  }

  test("snapshot merge: CDC rows win, deleted users absent") {
    val merged = Cdc.snapshotMerge(spark, sf).cache()
    assert(merged.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val cdcUsers = merged.filter(col("src") === "CDC").count()
    assert(cdcUsers > 0)
    assert(merged.filter(col("src") === "SNAPSHOT").count() > 0)
  }

  test("time travel returns one live row per user, consistent with the log") {
    val tt = Cdc.timeTravel(spark, sf).cache()
    assert(tt.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // cross-check one user against a manual scan of the log
    val t = Cdc.TimeTravelUs
    val manual = Cdc.log(spark, sf).filter(col("seq_us") <= t)
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("seq_us").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("operation") =!= "DELETE")
    assert(tt.count() == manual.count())
  }

  test("as-of join matches each purchase with the latest prior event") {
    val aj = Cdc.asofJoin(spark, sf).cache()
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(aj.count() == purchases)
    assert(aj.filter(col("wait_us") < 0).count() == 0)
  }

  test("throughput windows sum to total events") {
    val total = Cdc.throughput(spark, sf).agg(sum("events_per_minute")).first().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("net effect attributes retractions to the BEFORE event's type") {
    import spark.implicits._
    // user 1: INSERT 10.0 as purchase, then UPDATE to 4.0 as refund —
    // the type change must MOVE the 10.0 (and the row) out of purchase.
    // user 2: plain same-type update 5.0 -> 7.0 stays a net +7.0 in place.
    // user 3: INSERT 3.0 then DELETE typed differently — retraction lands
    // on the inserting type; the delete's own type gains nothing.
    val planted = Seq(
      (1L, 1L, "INSERT", 100L, "purchase", 10.0),
      (2L, 1L, "UPDATE", 200L, "refund", 4.0),
      (3L, 2L, "INSERT", 100L, "purchase", 5.0),
      (4L, 2L, "UPDATE", 200L, "purchase", 7.0),
      (5L, 3L, "INSERT", 100L, "signup", 3.0),
      (6L, 3L, "DELETE", 200L, "error", 0.0)
    ).toDF("event_id", "user_id", "operation", "seq_us", "event_type", "value")
      .withColumn("props", lit("{}"))
    val out = Cdc.netEffectFrom(planted).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    // purchase: +10 (u1 ins) -10 (u1 retract) +5 (u2 ins) -5 +7 (u2 upd) = 7.0
    // rows: +1 -1 +1 -1+1 = 1; changes: u1 ins, u2 ins, u2 upd = 3
    assert(out("purchase") == ((7.0, 1L, 3L)))
    // refund gains the moved row: +4.0, +1 row, 1 change (the update)
    assert(out("refund") == ((4.0, 1L, 1L)))
    // signup: +3 then retracted by the delete -> 0.0, 0 rows; BOTH changes
    // (the insert and the delete that touched its value) count here
    assert(out("signup") == ((0.0, 0L, 2L)))
    // the delete's own type group holds nothing — the retraction moved
    // value, row, and change attribution to the group that held the value
    assert(!out.contains("error"))
    // global invariants: values and rows conserve across groups
    assert(math.abs(out.values.map(_._1).sum - (4.0 + 7.0)) < 1e-9)
    assert(out.values.map(_._2).sum == 2L)
    assert(out.values.map(_._3).sum == planted.count())
  }

  test("pit join: every purchase matches exactly one containing version") {
    val pit = Cdc.pitJoin(spark, sf).cache()
    val purchases = Cdc.log(spark, sf).filter(col("event_type") === "purchase")
    // inner join loses nothing (every purchase is itself a log event, so a
    // version covering its timestamp always exists) and duplicates nothing
    assert(pit.count() == purchases.count())
    assert(pit.groupBy("p_event_id").count().filter(col("count") > 1).count() == 0)
    // the matched interval really contains the fact timestamp
    assert(pit.filter(col("p_ts_us") < col("valid_from_us")).count() == 0)
    // a purchase's own log row starts a version at its exact timestamp, so
    // the matched version is never strictly older than the fact
    assert(pit.filter(col("valid_from_us") =!= col("p_ts_us")).count() == 0)
  }

  test("reconcile flags exactly the buckets holding injected drift") {
    val rec = Cdc.reconcile(spark, sf).cache()
    // recompute which buckets SHOULD differ from the injected-drift rule
    val state = Cdc.snapshotMerge(spark, sf)
    val driftBuckets = state
      .filter(col("user_id") % 97 === 13 || col("user_id") % 113 === 7)
      .select((col("user_id") % 16).as("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    val flagged = rec.filter(!col("consistent"))
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert(flagged == driftBuckets)
    // clean buckets agree on both rows and checksums
    val clean = rec.filter(col("consistent"))
    assert(clean.filter(col("rows_src") =!= col("rows_tgt")
      || col("check_src") =!= col("check_tgt")).count() == 0)
  }

  test("scd2Compact conserves rows, tiles intervals, and never leaves equal neighbors") {
    val hist = Cdc.scd2History(spark, sf).cache()
    val comp = Cdc.scd2Compact(spark, sf).cache()
    // row conservation: collapsed counts sum back to the history mass
    assert(comp.agg(sum(col("n_collapsed"))).head().getLong(0) === hist.count())
    // per key: compacted intervals span exactly the history's span
    val histSpan = hist.groupBy("user_id")
      .agg(min("valid_from_us").as("f"), max("valid_to_us").as("t"))
    val compSpan = comp.groupBy("user_id")
      .agg(min("valid_from_us").as("f"), max("valid_to_us").as("t"))
    assert(histSpan.exceptAll(compSpan).count() === 0)
    // adjacent compacted runs always differ in (operation, value) — else
    // they would have been one run
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us")
    val equalNeighbors = comp
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("po", lag(col("operation"), 1).over(w))
      .filter(col("pv").isNotNull &&
        (col("pv") <=> col("value")) && (col("po") <=> col("operation")))
      .count()
    assert(equalNeighbors === 0)
    // exactly one current interval per key
    val multiCurrent = comp.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(multiCurrent === 0)
    hist.unpersist(); comp.unpersist()
  }

  test("tombstoneGc: purgeable ⊆ tombstoned ⊆ keys; reclaim counts real chain rows") {
    val gc = Cdc.tombstoneGc(spark, sf).collect()
    assert(gc.nonEmpty)
    gc.foreach { r =>
      assert(r.getAs[Long]("n_purgeable") <= r.getAs[Long]("n_tombstoned"))
      assert(r.getAs[Long]("n_tombstoned") <= r.getAs[Long]("n_keys"))
      if (r.getAs[Long]("n_purgeable") == 0)
        assert(r.getAs[Long]("rows_reclaimable") === 0L)
      else
        assert(r.getAs[Long]("rows_reclaimable") >= r.getAs[Long]("n_purgeable"))
    }
    // total keys partition the user space
    val users = Tables.events(spark, sf).select(countDistinct(col("user_id")))
      .head().getLong(0)
    assert(gc.map(_.getAs[Long]("n_keys")).sum === users)
  }

  test("snapshotDiff statuses partition the union of both as-of states") {
    val d = Cdc.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d.keySet.subsetOf(Set("added", "removed", "changed", "unchanged")))
    def asOfUsers(t: Long) = Cdc.scd2History(spark, sf)
      .filter(col("valid_from_us") <= t && col("valid_to_us") > t &&
        col("operation") =!= "DELETE")
      .select("user_id")
    val unionUsers = asOfUsers(Cdc.TimeTravelUs)
      .union(asOfUsers(Cdc.SnapshotDiffT2Us)).distinct().count()
    assert(d.values.sum === unionUsers)
  }

  test("ivm audit: delta fold equals final state on adversarial op sequences") {
    import spark.implicits._
    // the sequences naive lag-retraction gets wrong:
    // u1 update-born (no prior INSERT), then upsert-INSERT over live state
    // u2 delete-then-reinsert (the post-delete row must not retract the tombstone)
    // u3 lone DELETE of a never-seen key (must be a no-op)
    // u4 insert→delete (fully retracted: group nets to zero)
    val planted = Seq(
      (1L, 1L, "UPDATE", 100L, "a", 5.0),
      (2L, 1L, "INSERT", 200L, "a", 9.0),
      (3L, 2L, "INSERT", 100L, "b", 4.0),
      (4L, 2L, "DELETE", 200L, "b", 0.0),
      (5L, 2L, "UPDATE", 300L, "b", 6.0),
      (6L, 3L, "DELETE", 100L, "c", 0.0),
      (7L, 4L, "INSERT", 100L, "d", 2.0),
      (8L, 4L, "DELETE", 200L, "d", 0.0)
    ).toDF("event_id", "user_id", "operation", "seq_us", "event_type", "value")
      .withColumn("props", lit("{}"))
    val out = Cdc.ivmAuditFrom(planted).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    // every group must be consistent AND match the hand-computed final state
    assert(out("a") === ((1L, 1L, 9.0, 9.0, 1L)), s"a: ${out("a")}")
    assert(out("b") === ((1L, 1L, 6.0, 6.0, 1L)), s"b: ${out("b")}")
    assert(out.get("c").forall(_ == ((0L, 0L, 0.0, 0.0, 1L))), s"c: ${out.get("c")}")
    assert(out("d") === ((0L, 0L, 0.0, 0.0, 1L)), s"d: ${out("d")}")
    // and on the real corpus every type is consistent
    val real = Cdc.ivmAudit(spark, sf)
    assert(real.filter(col("consistent") =!= 1L).count() === 0)
  }

  test("watermark advice quantiles are ordered and bound the late mass") {
    import graft.operators.Events
    val wm = Events.watermarkAdvice(spark, sf).collect()
    assert(wm.nonEmpty)
    wm.foreach { r =>
      val (p50, p95, p99, mx) = (r.getAs[Long]("p50_us"), r.getAs[Long]("p95_us"),
        r.getAs[Long]("p99_us"), r.getAs[Long]("max_us"))
      assert(p50 <= p95 && p95 <= p99 && p99 <= mx,
        s"quantiles out of order for ${r.getString(0)}: $p50 $p95 $p99 $mx")
      assert(r.getAs[Long]("wm_advice_us") === p99)
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_events"))
    }
  }

  test("op-sequence audit flags the three grammar violations exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("opseq").toString
    // u1: INSERT, UPDATE               → legal
    // u2: UPDATE (no create), DELETE, UPDATE (post-delete mutation)
    // u3: INSERT, INSERT (dup create), DELETE, INSERT (legal re-create)
    val rows = Seq(
      (1L, 1000000000L, 1L, "signup", 1.0, "{}"),
      (2L, 2000000000L, 1L, "click", 1.0, "{}"),
      (3L, 1000000000L, 2L, "click", 1.0, "{}"),
      (4L, 2000000000L, 2L, "error", 1.0, "{}"),
      (5L, 3000000000L, 2L, "click", 1.0, "{}"),
      (6L, 1000000000L, 3L, "signup", 1.0, "{}"),
      (7L, 2000000000L, 3L, "signup", 1.0, "{}"),
      (8L, 3000000000L, 3L, "error", 1.0, "{}"),
      (9L, 4000000000L, 3L, "signup", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = Cdc.opSequenceAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m === Map(
      "create_missing" -> ((1L, 1L, 3L)),
      "post_delete_mutation" -> ((1L, 1L, 5L)),
      "duplicate_create" -> ((1L, 1L, 7L))))
  }

  test("incremental snapshot: chunk dedup rule yields zero mismatches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incsnap").toString
    // timeline 0..100s → t_mid = 50s. u1 snapshot-only; u2 snapshot then
    // log UPDATE (superseded); u3 log-born; u4 snapshot then log DELETE
    // (superseded AND dead in the final state).
    val rows = Seq(
      (1L, 0L, 1L, "signup", 1.0, "{}"),
      (2L, 10000000000L, 2L, "signup", 1.5, "{}"),
      (3L, 60000000000L, 2L, "click", 2.0, "{}"),
      (4L, 100000000000L, 3L, "signup", 3.0, "{}"),
      (5L, 20000000000L, 4L, "signup", 4.0, "{}"),
      (6L, 80000000000L, 4L, "error", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Cdc.incrementalSnapshot(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("chunk_id") === 0L)
    assert(r.getAs[Long]("n_snapshot") === 3L)   // u1, u2, u4
    assert(r.getAs[Long]("n_superseded") === 2L) // u2, u4
    assert(r.getAs[Long]("n_final") === 3L)      // u1, u2, u3 (u4 deleted)
    assert(r.getAs[Long]("n_mismatch") === 0L)
    // consistency also holds over the real corpus, in every chunk
    val real = Cdc.incrementalSnapshot(spark, sf)
    assert(real.agg(sum(col("n_mismatch"))).head().getLong(0) === 0L)
  }

  test("join-view IVM: the three delta terms fold to the direct join") {
    val out = Cdc.ivmJoinDelta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("mismatch") === 0L, s"delta fold diverged: $r")
      assert(r.getAs[Long]("n_view") ===
        r.getAs[Long]("n_old") + r.getAs[Long]("n_delta_a") +
          r.getAs[Long]("n_delta_b") + r.getAs[Long]("n_delta_ab"))
    }
    // the split genuinely exercises every term somewhere in the corpus
    import org.apache.spark.sql.Row
    val tot = Cdc.ivmJoinDelta(spark, sf)
      .agg(sum(col("n_old")), sum(col("n_delta_a")),
        sum(col("n_delta_b")), sum(col("n_delta_ab"))).head()
    (0 until 4).foreach(i => assert(tot.getLong(i) > 0L, s"term $i empty"))
  }

  test("topk IVM: candidate path when buffer holds, refill fallback when deletes promote an outsider") {
    import spark.implicits._
    val ms = 1000000L // 1ms in ns → 1000 in seq_us
    // base: five users at $1.00..$0.60, timestamps well below the pivot;
    // one far-future marker pushes the (min+max)/2 pivot past the base
    def write(delta: Seq[(Long, Long, String, Double)]): String = {
      var id = 0L
      val base = Seq(1L -> 1.00, 2L -> 0.90, 3L -> 0.80, 4L -> 0.70, 5L -> 0.60)
        .map { case (u, v) => id += 1; (id, ms * id, u, "purchase", v, "{}") }
      val d = delta.map { case (u, at, typ, v) =>
        id += 1; (id, at, u, typ, v, "{}") }
      val dir = Files.createTempDirectory("topkivm").toString
      (base ++ d).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    val far = 1000000L * ms // seq_us 10^9: pivot lands mid-range
    // A: delta only adds to the reigning leader → no refill, head stands
    val a = Cdc.topkIvm(spark, write(Seq((1L, far, "purchase", 0.10))),
      k = 2, buffer = 1).collect()
    assert(a.map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("user_id"),
      r.getAs[Long]("cents"), r.getAs[Long]("refill"))).toSeq ===
      Seq((1L, 1L, 110L), (2L, 2L, 90L)).map(t => (t._1, t._2, t._3, 0L)))
    // B: deletes gut the entire stored head → untouched u4/u5 must surface,
    // which only the refill fallback can see
    val b = Cdc.topkIvm(spark, write(Seq(
      (1L, far, "error", 0.95), (2L, far + ms, "error", 0.85),
      (3L, far + 2 * ms, "error", 0.75))), k = 2, buffer = 1).collect()
    assert(b.map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("user_id"),
      r.getAs[Long]("cents"), r.getAs[Long]("refill"))).toSeq ===
      Seq((1L, 4L, 70L, 1L), (2L, 5L, 60L, 1L)))
  }

  test("lww merge: per-field winners, priority tiebreak, delete tombstones both registers") {
    import spark.implicits._
    val ms = 1000000L
    // event_id % 2 == 0 → replica a (prio 2); odd → replica b (prio 1)
    val rows = Seq(
      // u1: purchase(a)@1 then click(b)@2 → field A follows the later click;
      //     view(b)@3 writes field B
      (2L, 1 * ms, 1L, "purchase", 5.0, "{}"),
      (3L, 2 * ms, 1L, "click", 7.0, "{}"),
      (5L, 3 * ms, 1L, "view", 9.0, "{}"),
      // u2: two purchases at the SAME timestamp — replica a must win on
      //     priority even though b carries the larger event_id
      (6L, 1 * ms, 2L, "purchase", 1.0, "{}"),
      (7L, 1 * ms, 2L, "purchase", 2.0, "{}"),
      // u3: purchase then DELETE → tombstones in BOTH registers
      (8L, 1 * ms, 3L, "purchase", 4.0, "{}"),
      (9L, 2 * ms, 3L, "error", 0.0, "{}"))
    val dir = Files.createTempDirectory("lww").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Cdc.lwwMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.lang.Double]("value_a")).map(_.toDouble),
          r.getAs[String]("src_a"),
          Option(r.getAs[java.lang.Double]("value_b")).map(_.toDouble),
          r.getAs[String]("src_b")))).toMap
    assert(out(1L) === ((Some(7.0), "b", Some(9.0), "b")), s"u1 got ${out(1L)}")
    assert(out(2L) === ((Some(1.0), "a", None, null)), s"u2 got ${out(2L)}")
    assert(out(3L) === ((None, "b", None, "b")), s"u3 got ${out(3L)}")
  }
}
