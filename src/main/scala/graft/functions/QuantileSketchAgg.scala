package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftSqlBridge => B}

/** Mergeable KLL-style quantile sketch state: a compactor hierarchy where
  * level i holds items of weight 2^i, each level capped at `k` items.
  * A full level sorts and promotes every second item to the level above
  * (the kept half carries doubled weight — total weight is preserved, the
  * odd leftover stays behind). Selection alternates between even/odd
  * offsets per level (deterministic low-discrepancy compaction — no RNG,
  * so results are reproducible) which bounds the rank error per
  * compaction at w/2 against O(n/k) compactions: ~1/k relative rank
  * error in practice.
  *
  * State is O(k · log(n/k)) regardless of group size — the per-group
  * percentile answer at 500-table × million-key cardinality where a
  * distributed sort per group (exact percentile) is unpayable. The
  * update/merge shape is associative, so map-side partial aggregation
  * works and a group's rows never co-locate.
  */
final class QuantileSketch(val k: Int) extends Serializable {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  val flips: ArrayBuffer[Boolean] = ArrayBuffer(false)
  var n: Long = 0L

  private def ensure(i: Int): Unit =
    while (levels.size <= i) { levels += ArrayBuffer.empty[Double]; flips += false }

  def insert(v: Double): Unit = { levels(0) += v; n += 1; compact() }

  def compact(): Unit = {
    var i = 0
    while (i < levels.size) {
      if (levels(i).size >= k) {
        val sorted = levels(i).sorted
        ensure(i + 1)
        val even = sorted.size - (sorted.size % 2)
        val off = if (flips(i)) 1 else 0
        flips(i) = !flips(i)
        var j = off
        while (j < even) { levels(i + 1) += sorted(j); j += 2 }
        levels(i).clear()
        if (even < sorted.size) levels(i) += sorted(even) // odd leftover keeps weight 2^i
      }
      i += 1
    }
  }

  def merge(other: QuantileSketch): QuantileSketch = {
    var i = 0
    while (i < other.levels.size) {
      ensure(i)
      levels(i) ++= other.levels(i)
      i += 1
    }
    n += other.n
    compact()
    this
  }

  /** Step-quantile: smallest value whose cumulative weight reaches
    * ceil(p·n) over the weighted, sorted item multiset.
    */
  def quantile(p: Double): Double = {
    if (n == 0) return Double.NaN
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(p * n).toLong)
    var cum = 0L
    var j = 0
    while (j < sorted.size) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val nItems = levels.map(_.size).sum
    val bb = ByteBuffer.allocate(8 + 4 + levels.size * (1 + 4) + nItems * 8)
    bb.putLong(n)
    bb.putInt(levels.size)
    var i = 0
    while (i < levels.size) {
      bb.put(if (flips(i)) 1.toByte else 0.toByte)
      bb.putInt(levels(i).size)
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object QuantileSketch {
  def deserialize(bytes: Array[Byte], k: Int): QuantileSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new QuantileSketch(k)
    sk.n = bb.getLong
    val nLevels = bb.getInt
    sk.levels.clear(); sk.flips.clear()
    var i = 0
    while (i < nLevels) {
      sk.flips += (bb.get() == 1.toByte)
      val sz = bb.getInt
      val lvl = ArrayBuffer.empty[Double]
      var j = 0
      while (j < sz) { lvl += bb.getDouble; j += 1 }
      sk.levels += lvl
      i += 1
    }
    sk
  }
}

/** Aggregate wrapper: `quantile_sketch(col, probs, k)` → array<double> of
  * step-quantile estimates at `probs` — the mergeable-sketch complement
  * to count_min_sketch for monitoring at cardinality (per-group
  * percentiles with O(k log n) state and no distributed sort; the exact
  * twin is Tpch.qPercentiles).
  */
case class QuantileSketchAgg(
    child: Expression,
    probs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Number].doubleValue()
      // NaN has no rank — skip it like null (sorting with NaN present
      // would corrupt every compaction below it)
      if (!d.isNaN) buf.insert(d)
    }
    buf
  }

  override def merge(a: QuantileSketch, b: QuantileSketch): QuantileSketch = a.merge(b)

  override def eval(buf: QuantileSketch): Any =
    ArrayData.toArrayData(probs.map(buf.quantile).toArray)

  override def serialize(buf: QuantileSketch): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {
  /** Column API: step-quantile estimates of the group's `c` values. */
  def quantileSketch(c: Column, probs: Seq[Double], k: Int = 200): Column =
    B.column(QuantileSketchAgg(B.expression(c), probs, k).toAggregateExpression())
}
