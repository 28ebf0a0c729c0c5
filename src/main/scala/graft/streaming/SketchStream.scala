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
}
