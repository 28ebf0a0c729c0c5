package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable as-of (point-in-time) join — the dimension lookup every CDC
  * consumer runs: for each left row, the latest right row with
  * `rightTime <= leftTime` per key.
  *
  * Spark-first via the union+window trick: tag both sides, union them,
  * ONE shuffle on the keys, one sort on (time, side, tiebreaks), carry
  * the last right-side values forward, keep the left rows. No range
  * self-join, no BroadcastNestedLoopJoin, no per-key driver loop — the
  * cost at 100 TB is exactly one sort-shuffle of left+right, which is the
  * lower bound for this operator without a time-bucketed index.
  *
  * Contract: `carryCols` (right-side columns to bring along, emitted as
  * `asof_<name>`) must not collide with left column names — pre-alias the
  * right side if they do. Ties (`rightTime == leftTime`) match, i.e.
  * inclusive `<=`, same as SQL ASOF JOIN. `tiebreak` columns make the
  * result deterministic when one key has equal timestamps on the same
  * side. `tolerance` (same unit as the time columns) nulls out a match
  * older than `leftTime - tolerance` — the "don't join stale state" guard.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, carryCols: Seq[String],
      tiebreak: Seq[String] = Seq.empty,
      tolerance: Option[Long] = None): DataFrame = {
    require(carryCols.nonEmpty, "carryCols must name at least one right column")
    val collisions = carryCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"carryCols collide with left columns: ${collisions.mkString(", ")} — alias the right side")

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
    // right sorts before left at equal times → inclusive (<=) semantics
    val ord: Seq[Column] =
      Seq(col("_asof_t"), col("_asof_side")) ++ tiebreak.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = carryCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, c) =>
        df.withColumn(s"asof_$c",
          last(when(col("_asof_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
      .withColumn("asof_t",
        last(when(col("_asof_side") === 0, col("_asof_t")), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)

    val bounded = tolerance match {
      case Some(tol) =>
        // a stale match degrades to no-match: every asof_* column nulls
        val stale = col("asof_t") < col("_asof_t") - lit(tol)
        (carryCols.map(c => s"asof_$c") :+ "asof_t").foldLeft(carried) {
          (df, c) => df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
        }
      case None => carried
    }
    bounded.drop("_asof_t", "_asof_side")
  }
}
