package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable as-of (point-in-time) join — the dimension lookup every CDC
  * consumer runs: for each left row, the latest right row with
  * `rightTime <= leftTime` per key (`direction = "backward"`, the
  * default), or the earliest right row with `rightTime >= leftTime`
  * (`direction = "forward"` — next-event / time-to-conversion lookups).
  *
  * Spark-first via the union+window trick: tag both sides, union them,
  * ONE shuffle on the keys, one sort on (time, side, tiebreaks), carry
  * the nearest right-side values across, keep the left rows. No range
  * self-join, no BroadcastNestedLoopJoin, no per-key driver loop — the
  * cost at 100 TB is exactly one sort-shuffle of left+right, which is the
  * lower bound for this operator without a time-bucketed index.
  *
  * Contract: `carryCols` (right-side columns to bring along, emitted as
  * `asof_<name>`) must not collide with left column names — pre-alias the
  * right side if they do. Ties (`rightTime == leftTime`) match in either
  * direction, i.e. inclusive `<=`/`>=`, same as SQL ASOF JOIN. `tiebreak`
  * columns make the result deterministic when one key has equal
  * timestamps on the same side: backward picks the tiebreak-LARGEST
  * right row among equal latest times, forward the tiebreak-SMALLEST
  * among equal earliest times. `tolerance` (same unit as the time
  * columns) nulls out a match farther than `tolerance` from `leftTime`
  * — the "don't join stale state" guard (backward: older than
  * `leftTime - tolerance`; forward: later than `leftTime + tolerance`).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, carryCols: Seq[String],
      tiebreak: Seq[String] = Seq.empty,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    require(carryCols.nonEmpty, "carryCols must name at least one right column")
    val collisions = carryCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"carryCols collide with left columns: ${collisions.mkString(", ")} — alias the right side")
    val backward = direction == "backward"

    val l = left
      .withColumn("_asof_t", col(leftTime).cast("long"))
      .withColumn("_asof_side", lit(1))
    val r0 = right
      .select((keyCols ++ carryCols :+ rightTime).distinct.map(col): _*)
      .withColumn("_asof_t", col(rightTime).cast("long"))
      .withColumn("_asof_side", lit(0))
    // the raw right time column only stays if the caller carries it
    val r = if (carryCols.contains(rightTime) || keyCols.contains(rightTime)) r0
      else r0.drop(rightTime)
    // at equal times the right side must fall inside the left row's frame:
    // backward frames look back, so right (0) sorts before left (1) — the
    // natural ascending order; forward frames look ahead, so flip the side
    val sideOrd = if (backward) col("_asof_side") else col("_asof_side").desc
    val ord: Seq[Column] = Seq(col("_asof_t"), sideOrd) ++ tiebreak.map(col)
    val w0 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val w =
      if (backward) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def nearest(c: Column): Column =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)

    val carried = carryCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, c) =>
        df.withColumn(s"asof_$c", nearest(when(col("_asof_side") === 0, col(c))))
    }
      .withColumn("asof_t", nearest(when(col("_asof_side") === 0, col("_asof_t"))))
      .filter(col("_asof_side") === 1)

    val bounded = tolerance match {
      case Some(tol) =>
        // an out-of-tolerance match degrades to no-match: every asof_* nulls
        val stale =
          if (backward) col("asof_t") < col("_asof_t") - lit(tol)
          else col("asof_t") > col("_asof_t") + lit(tol)
        (carryCols.map(c => s"asof_$c") :+ "asof_t").foldLeft(carried) {
          (df, c) => df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
        }
      case None => carried
    }
    bounded.drop("_asof_t", "_asof_side")
  }
}
