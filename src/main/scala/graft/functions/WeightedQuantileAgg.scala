package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** EXACT mergeable weighted quantiles as a TypedImperativeAggregate —
  * the sketch-family hole between I11 (q-digest: approximate,
  * mergeable) and B23b (`percentile`: exact, unweighted): per group,
  * for each requested percent p, the smallest value v whose cumulative
  * weight reaches p% of the group's total weight (weighted
  * percentile-disc, lower — an integer-exact definition: the selection
  * compares `100·cumW ≥ p·W` on BIGINTs, so there is no interpolation
  * and no float anywhere).
  *
  * Buffer = value → Σweight map. Updates and merges are plain map
  * addition — associative and commutative, so the result is provably
  * independent of partitioning and merge order (spec-pinned, the B42
  * discipline). Map-side partial aggregation reduces each partition to
  * ≤ |value domain| entries before the exchange.
  *
  * The honest scale contract: EXACT requires the buffer to hold the
  * group's distinct-value set, so the aggregate enforces a hard
  * `maxDistinct` bound and RAISES past it rather than silently
  * degrading — at 100 TB you either quantize the value domain upfront
  * (as `q_weighted_percentiles` does: integer dollars — bounded by
  * construction) or accept approximation and use the I11 q-digest,
  * which IS the spill-to-sketch answer, kept as its own operator so
  * each tool's error contract stays visible. Negative/zero weights are
  * rejected (they make cumulative weight non-monotone and the
  * definition meaningless).
  */
case class WeightedQuantileAgg(
    value: Expression,
    weight: Expression,
    percents: Seq[Int],
    maxDistinct: Int = 1 << 20,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_weighted_quantiles"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  private def add(buf: java.util.HashMap[Long, Long], v: Long, w: Long): Unit = {
    if (w <= 0)
      throw new IllegalArgumentException(
        s"weighted quantile requires positive weights; got $w")
    buf.merge(v, w, (a, b) => a + b)
    if (buf.size > maxDistinct)
      throw new IllegalStateException(
        s"weighted quantile buffer exceeded $maxDistinct distinct values: " +
          "quantize the value domain upfront or use the q-digest sketch")
  }

  override def update(buf: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = value.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null)
      add(buf, v.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long],
      b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    if (buf.isEmpty)
      return new GenericArrayData(Array.fill[Any](percents.size)(null))
    val entries = new Array[Long](buf.size * 2)
    var n = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(2 * n) = e.getKey
      entries(2 * n + 1) = e.getValue
      n += 1
    }
    // sort (value, weight) pairs by value
    val idx = Array.range(0, n).sortBy(i => entries(2 * i))
    var total = 0L
    idx.foreach(i => total += entries(2 * i + 1))
    val out = new Array[Any](percents.size)
    percents.zipWithIndex.foreach { case (p, pi) =>
      var cum = 0L
      var j = 0
      var ans = entries(2 * idx(n - 1)) // fallback: the maximum
      var found = false
      while (j < n && !found) {
        cum += entries(2 * idx(j) + 1)
        // integer-exact selection: smallest v with 100·cumW ≥ p·W
        if (100L * cum >= p.toLong * total) { ans = entries(2 * idx(j)); found = true }
        j += 1
      }
      out(pi) = ans
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): WeightedQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): WeightedQuantileAgg =
    copy(value = cs(0), weight = cs(1))
}

object WeightedQuantileAgg {
  /** Column API: exact weighted percentile-disc values (one array slot
    * per percent, ascending with the given percents). */
  def weighted_quantiles(value: Column, weight: Column,
      percents: Seq[Int]): Column =
    Bridge.column(WeightedQuantileAgg(Bridge.expression(value),
      Bridge.expression(weight), percents).toAggregateExpression())
}
