package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftExpressionBridge

/** Bounded top-k aggregate: per group, the k best (score, id) pairs by
  * (score DESC, id ASC) as a best-first array of structs.
  *
  * The scalable replacement for `row_number() over (partition by g order by
  * s) <= k`: a window rank SORTS every group's full row set after shuffling
  * it; this aggregate keeps a k-bounded heap per group on the MAP side, so
  * the shuffle carries at most k pairs per (group, input partition) and no
  * sort of the data ever happens — the classic top-k-per-key pattern at
  * 100 TB (the salted [[graft.transform.Transforms.topNPerKey]] covers the
  * hot-single-key regime; this covers high-cardinality grouping).
  *
  * Deterministic total order (score DESC, id ASC) makes results and the
  * DuckDB oracle replay exact, including ties.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKEntry]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKEntry] =
    new java.util.PriorityQueue[TopKEntry](k + 1, TopKEntry.WorstFirst)

  private def offer(buf: java.util.PriorityQueue[TopKEntry], s: Double, i: Long): Unit = {
    val entry = TopKEntry(s, i)
    if (buf.size < k) buf.add(entry)
    else if (TopKEntry.WorstFirst.compare(entry, buf.peek()) > 0) {
      buf.poll(); buf.add(entry)
    }
  }

  override def update(buf: java.util.PriorityQueue[TopKEntry],
      input: InternalRow): java.util.PriorityQueue[TopKEntry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[TopKEntry],
      other: java.util.PriorityQueue[TopKEntry]): java.util.PriorityQueue[TopKEntry] = {
    other.forEach(e => offer(buf, e.s, e.i))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[TopKEntry]): Any = {
    val arr = buf.toArray(new Array[TopKEntry](0))
    // best first: score DESC, id ASC
    java.util.Arrays.sort(arr, TopKEntry.WorstFirst.reversed())
    new GenericArrayData(arr.map(e => InternalRow(e.s, e.i): Any))
  }

  override def serialize(buf: java.util.PriorityQueue[TopKEntry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { e => bb.putDouble(e.s); bb.putLong(e.i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKEntry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Heap entry; kept as a tiny value class so 64-bit ids survive exactly. */
final case class TopKEntry(s: Double, i: Long)

object TopKEntry {
  /** Worst-first heap order: (score ASC, id DESC) — head is the eviction
    * candidate; its reverse is the output order (score DESC, id ASC).
    */
  val WorstFirst: java.util.Comparator[TopKEntry] = new java.util.Comparator[TopKEntry] {
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c = java.lang.Double.compare(a.s, b.s)
      if (c != 0) c else java.lang.Long.compare(b.i, a.i)
    }
  }
}

object TopKAggregate {
  /** Column API: `topKByScore(score, id, k)` inside `.agg(...)`. Inputs are
    * cast to double/long (update() reads exactly those types), so any
    * numeric score and integral id column works.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKByScore(
        org.apache.spark.sql.catalyst.expressions.Cast(
          GraftExpressionBridge.expression(score), DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(
          GraftExpressionBridge.expression(id), LongType),
        k).toAggregateExpression())
}
