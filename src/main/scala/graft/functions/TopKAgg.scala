package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Bounded per-key top-k as a NATIVE aggregate — the scale-critical
  * alternative to the `row_number().over(partitionBy(key)) <= k`
  * window: the window formulation SHUFFLES AND SORTS EVERY ROW of every
  * key before discarding all but k, while an aggregate prunes to k per
  * partition map-side, so the exchange carries at most k·#partitions
  * rows per key and no sort ever sees the full data. At 10¹¹ rows and
  * k = 10 that is the difference between a corpus-wide sort and a
  * near-free partial aggregation.
  *
  * Semantics: keeps the k largest (ord, payload) pairs in descending
  * lexicographic order — ties on `ord` resolve by larger `payload`, so
  * the result is a deterministic multiset (duplicates retained).
  * Nulls in either input are skipped. Runs in ObjectHashAggregate
  * (TypedImperativeAggregate's engine); the buffer is a k-bounded
  * binary min-heap, O(k) memory, O(log k) per row. */
case class TopKLongs(ordExpr: Expression, payloadExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongs.Heap] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(ordExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKLongs.Heap =
    new TopKLongs.Heap(k)

  private def asLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"top_k expects integral inputs, got ${other.getClass.getSimpleName}")
  }

  override def update(b: TopKLongs.Heap, input: InternalRow): TopKLongs.Heap = {
    val o = ordExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (o != null && p != null) b.offer(asLong(o), asLong(p))
    b
  }

  override def merge(b: TopKLongs.Heap, other: TopKLongs.Heap): TopKLongs.Heap = {
    other.foreach((o, p) => b.offer(o, p))
    b
  }

  override def eval(b: TopKLongs.Heap): Any = {
    val sorted = b.sortedDesc()
    new GenericArrayData(sorted.map { case (o, p) =>
      InternalRow(o, p)
    })
  }

  override def serialize(b: TopKLongs.Heap): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.size * 16)
    buf.putInt(b.size)
    b.foreach((o, p) => { buf.putLong(o); buf.putLong(p) })
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongs.Heap = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val h = new TopKLongs.Heap(k)
    var i = 0
    while (i < n) { h.offer(buf.getLong, buf.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(ordExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKLongs {

  /** k-bounded min-heap over (ord, payload) lexicographic order: the
    * root is the SMALLEST retained pair, evicted when a larger one
    * arrives on a full heap. */
  final class Heap(k: Int) {
    private val ords = new Array[Long](k)
    private val pays = new Array[Long](k)
    private var n = 0

    def size: Int = n

    @inline private def less(o1: Long, p1: Long, o2: Long, p2: Long): Boolean =
      o1 < o2 || (o1 == o2 && p1 < p2)

    def offer(o: Long, p: Long): Unit = {
      if (n < k) {
        var i = n
        ords(i) = o; pays(i) = p; n += 1
        while (i > 0 && less(ords(i), pays(i), ords((i - 1) / 2), pays((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (less(ords(0), pays(0), o, p)) {
        ords(0) = o; pays(0) = p
        siftDown(0)
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val to = ords(i); ords(i) = ords(j); ords(j) = to
      val tp = pays(i); pays(i) = pays(j); pays(j) = tp
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && less(ords(l), pays(l), ords(m), pays(m))) m = l
        if (r < n && less(ords(r), pays(r), ords(m), pays(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ords(i), pays(i)); i += 1 }
    }

    /** retained pairs, largest first */
    def sortedDesc(): Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { out(i) = (ords(i), pays(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long), b: (Long, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 > b._2))
      out
    }
  }

  /** Column API: `topK(3, col("score"), col("id"))` →
    * `array<struct<ord, payload>>`, largest first. */
  def topK(k: Int, ord: Column, payload: Column): Column =
    column(TopKLongs(expression(ord), expression(payload), k)
      .toAggregateExpression())
}
