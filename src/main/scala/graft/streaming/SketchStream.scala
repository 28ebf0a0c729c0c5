package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming distinct-cardinality tracking with BOUNDED state: a mergeable
  * HLL sketch per key held in the state store instead of the exact user
  * set (reference: cdc_500_tables_streaming.py:366-425 tracks per-table
  * user activity; an exact streaming COUNT(DISTINCT) would hold every key
  * it has ever seen — state grows with the corpus and the job eventually
  * dies. A 2^12-register sketch is ~2 KB per group FOREVER, at ~1.6%
  * standard error).
  *
  * Built on the same Apache DataSketches HLL that backs Spark's
  * `hll_sketch_agg`, so these state sketches stay wire-compatible with
  * the batch sketch index ([[graft.operators.Sketches.buildHllIndex]]) —
  * a batch-built index can seed the stream and vice versa.
  */
object SketchStream {

  case class TypeEv(event_type: String, user_id: Long)
  case class HllState(bytes: Array[Byte], n_events: Long)
  case class TypeDistinct(event_type: String, est_users: Long, n_events: Long)

  /** Per event_type: running distinct-user estimate + exact event count,
    * updated each micro-batch from the HLL held in state. Update-mode
    * emission (one row per key per batch). lgK=12 ⇒ ~1.6% RSE, 2 KB
    * state/key — the knob trades accuracy for state size explicitly.
    */
  def distinctByType(normalized: DataFrame, lgK: Int = 12)(
      implicit spark: SparkSession): Dataset[TypeDistinct] = {
    import org.apache.datasketches.hll.HllSketch
    implicit val evEnc = Encoders.product[TypeEv]
    implicit val stEnc = Encoders.product[HllState]
    implicit val outEnc = Encoders.product[TypeDistinct]
    normalized
      .select(col("event_type"), col("user_id"))
      .as[TypeEv]
      .groupByKey(_.event_type)(Encoders.STRING)
      .mapGroupsWithState[HllState, TypeDistinct](GroupStateTimeout.NoTimeout) {
        (key: String, evs: Iterator[TypeEv], state: GroupState[HllState]) =>
          val sketch = state.getOption
            .map(s => HllSketch.heapify(s.bytes))
            .getOrElse(new HllSketch(lgK))
          var n = state.getOption.map(_.n_events).getOrElse(0L)
          evs.foreach { e => sketch.update(e.user_id); n += 1 }
          state.update(HllState(sketch.toCompactByteArray, n))
          TypeDistinct(key, Math.round(sketch.getEstimate), n)
      }
  }

  case class SsCounter(item: Long, cnt: Long, err: Long)
  case class SsState(counters: Seq[SsCounter])
  case class TopKOut(event_type: String, item: Long, est_count: Long,
      max_err: Long, rnk: Long)

  /** #279 Streaming heavy hitters with BOUNDED state: the Space-Saving
    * summary (Metwally et al.) — at most `m` counters per key, FOREVER,
    * with the classic guarantees: any item with true count > N/m is in
    * the summary, every estimate satisfies true ≤ est ≤ true + err, and
    * an item never evicted carries err = 0 (its count is EXACT). The
    * streaming complement of the batch `ev_heavy_hitters`: an exact
    * streaming GROUP BY item would hold every item ever seen.
    *
    * Update-mode emission: each micro-batch re-emits the key's current
    * top-`k` (est desc, item asc — deterministic); eviction picks the
    * minimum counter with the smallest-item tie-break, so a replay
    * reproduces the summary bit-for-bit.
    */
  def topKByType(normalized: DataFrame, m: Int = 64, k: Int = 10)(
      implicit spark: SparkSession): Dataset[TopKOut] = {
    implicit val evEnc = Encoders.product[TypeEv]
    implicit val stEnc = Encoders.product[SsState]
    implicit val outEnc = Encoders.product[TopKOut]
    normalized
      .select(col("event_type"), col("user_id"))
      .as[TypeEv]
      .groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState[SsState, TopKOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (key: String, evs: Iterator[TypeEv], state: GroupState[SsState]) =>
          val cs = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
          state.getOption.foreach(_.counters.foreach(c =>
            cs(c.item) = (c.cnt, c.err)))
          evs.foreach { e =>
            cs.get(e.user_id) match {
              case Some((c, err)) => cs(e.user_id) = (c + 1, err)
              case None if cs.size < m => cs(e.user_id) = (1L, 0L)
              case None =>
                // evict the minimum counter, smallest item on ties —
                // deterministic under replay
                val (evicted, (cmin, _)) = cs.minBy { case (i, (c, _)) => (c, i) }
                cs.remove(evicted)
                cs(e.user_id) = (cmin + 1, cmin)
            }
          }
          state.update(SsState(cs.toSeq.map { case (i, (c, e)) => SsCounter(i, c, e) }
            .sortBy(c => (-c.cnt, c.item))))
          cs.toSeq.map { case (i, (c, e)) => (i, c, e) }
            .sortBy { case (i, c, _) => (-c, i) }
            .take(k).zipWithIndex.iterator
            .map { case ((i, c, e), r) => TopKOut(key, i, c, e, r + 1L) }
      }
  }
}
