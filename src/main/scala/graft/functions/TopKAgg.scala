package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_agg(value, k)` → the k largest values per group, as a DESC-sorted
  * `array<double>` — per-group top-k as an AGGREGATE instead of a window.
  *
  * Spark's native spelling of per-group top-k (`row_number() OVER
  * (PARTITION BY g ORDER BY v DESC)` then `rank <= k`) is the plan shape
  * the reference's per-group rankings inherit (`olap_queries.sql:4-13`).
  * Spark ≥3.5 mitigates it with `InferWindowGroupLimit` (a map-side
  * WindowGroupLimit pre-filters each partition to rank ≤ k), but
  * `WindowGroupLimitExec` requires its child SORTED on (g, v) — both the
  * partial and final stages sort their entire input — and still carries
  * every within-limit row through the final window. This aggregate keeps a
  * bounded k-element min-heap per group instead, with no sort requirement
  * anywhere: as a proper `TypedImperativeAggregate` it plans two-phase, so
  * map-side partial heaps absorb rows in scan order and the shuffle
  * carries at most k doubles per (group × map partition) — the reduction
  * `TakeOrderedAndProject` gives a global top-k (o01), made per-group.
  * Sorting happens once, over k elements, at eval.
  *
  * Heap ties keep an arbitrary one of the equal values, so the OUTPUT value
  * multiset is still deterministic — ordering metadata (which row carried
  * the tied value) is deliberately not exposed.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] with ImplicitCastInputTypes {

  // k is plan-constant: it sizes every buffer, so it must fold at analysis
  private lazy val k: Int = kExpr.eval() match {
    case i: Int if i > 0 => i
    case other => throw new IllegalArgumentException(
      s"topk_agg k must be a positive INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    a.absorb(b); a
  }

  override def eval(buf: TopKAgg.Heap): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap =
    TopKAgg.Heap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKAgg {

  /** Bounded min-heap over primitive doubles: root = smallest kept value,
    * so a new candidate either beats the root (replace + sift) or is
    * discarded in O(1). Size and memory are k, independent of group size. */
  final class Heap(val k: Int) {
    private val arr = new Array[Double](k)
    private var n = 0

    def offer(v: Double): Unit =
      if (n < k) {
        arr(n) = v; n += 1
        var i = n - 1 // sift up
        while (i > 0 && arr((i - 1) / 2) > arr(i)) {
          val p = (i - 1) / 2
          val t = arr(p); arr(p) = arr(i); arr(i) = t
          i = p
        }
      } else if (v > arr(0)) {
        arr(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < n && arr(l) < arr(m)) m = l
          if (r < n && arr(r) < arr(m)) m = r
          if (m == i) done = true
          else { val t = arr(m); arr(m) = arr(i); arr(i) = t; i = m }
        }
      }

    def absorb(other: Heap): Unit = {
      var i = 0
      while (i < other.n) { offer(other.arr(i)); i += 1 }
    }

    def sortedDesc: Array[Double] = {
      val out = java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(out)
      var i = 0
      var j = out.length - 1
      while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
      out
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * n)
      bb.putInt(k).putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(arr(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val h = new Heap(bb.getInt())
      val n = bb.getInt()
      var i = 0
      // re-offering preserves the heap invariant regardless of stored order
      while (i < n) { h.offer(bb.getDouble()); i += 1 }
      h
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_agg", exprs => TopKAgg(exprs(0), exprs(1)), "built-in")
}
