package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as an AGGREGATE: per group, the k largest (value, id)
  * pairs ordered by (value desc, id asc), kept in a k-element sorted
  * buffer.
  *
  * This is the scalable alternative to the `row_number() <= k` window
  * form: the window must SHUFFLE AND SORT every row of every group,
  * while this aggregate's map-side partial combine reduces each
  * partition to at most k·groups rows before the exchange — at 100 TB
  * the shuffle carries k rows per group instead of the whole table.
  *
  *   - update: one compare against the current worst for rows outside
  *     the running top-k (the overwhelming majority); O(k) insertion
  *     otherwise
  *   - merge: two-pointer merge of two sorted buffers, truncated at k —
  *     associative + commutative, so the result is independent of
  *     partitioning/merge order (ids must be unique for ties to be
  *     deterministic)
  *   - eval: array<struct<v double, id long>> sorted best-first
  */
case class TopKAgg(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k >= 1)

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  @inline private def better(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  override def createAggregationBuffer(): TopKAgg.Buf =
    new TopKAgg.Buf(0, new Array[Double](k), new Array[Long](k))

  private def insert(buf: TopKAgg.Buf, v: Double, id: Long): Unit = {
    if (buf.n == k && !better(v, id, buf.vs(k - 1), buf.ids(k - 1))) return
    var i = if (buf.n == k) k - 1 else buf.n
    while (i > 0 && better(v, id, buf.vs(i - 1), buf.ids(i - 1))) {
      if (i < k) { buf.vs(i) = buf.vs(i - 1); buf.ids(i) = buf.ids(i - 1) }
      i -= 1
    }
    buf.vs(i) = v
    buf.ids(i) = id
    if (buf.n < k) buf.n += 1
  }

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      insert(buf, v.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    var j = 0
    while (j < b.n) { insert(a, b.vs(j), b.ids(j)); j += 1 }
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.vs(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.vs(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    buf.n = n
    var i = 0
    while (i < n) { buf.vs(i) = bb.getDouble; buf.ids(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKAgg =
    copy(value = cs(0), id = cs(1))
}

object TopKAgg {
  /** Sorted best-first bounded buffer: n valid entries of (vs, ids). */
  final class Buf(var n: Int, val vs: Array[Double], val ids: Array[Long])

  /** Column API: per-group top-k (value desc, id asc) pairs. */
  def top_k(value: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(value), Bridge.expression(id), k)
      .toAggregateExpression())
}
