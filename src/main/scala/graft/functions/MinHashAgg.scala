package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** MinHash signature as an AGGREGATE: folds the element hashes of a
  * whole group (e.g. every document hash of a source) into one
  * `numPerm`-wide signature, so set similarity between GROUPS is
  * estimable from two fixed-width arrays.
  *
  * TypedImperativeAggregate with a primitive long[] buffer:
  *   - update: one universal-hash min per permutation — O(numPerm),
  *     no allocation
  *   - merge: elementwise unsigned min — associative + commutative,
  *     so partial aggregation (map-side combine) is exact and the
  *     result is independent of partitioning/merge order — the
  *     distributed-correctness requirement
  *   - serialize: packed little-endian longs
  *
  * The per-permutation hash family matches [[GraftHash.minhash]]
  * (same seed → comparable signatures).
  */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    seed: Long,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numPerm >= 1)
  // the portable permutation family (permA/permB) is seed-free: reject
  // a non-zero seed rather than silently ignore it — two "independent"
  // portable sketches with different seeds would be identical
  require(!portable || seed == 0L,
    "portable MinHashAgg ignores the seed; pass seed = 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_agg"

  // portable mode: values live in [0, P61) → signed compare; empty
  // groups (impossible under groupBy, but kept consistent with
  // GraftHash.minhashMod) evaluate to P61
  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(if (portable) GraftHash.P61 else -1L) // unsigned max

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var p = 0
      while (p < numPerm) {
        if (portable) {
          val h = (GraftHash.permA(p) * x + GraftHash.permB(p)) % GraftHash.P61
          if (h < buf(p)) buf(p) = h
        } else {
          val a = GraftHash.mix64(seed + 2L * p) | 1L
          val b = GraftHash.mix64(seed + 2L * p + 1)
          val h = a * x + b
          if (java.lang.Long.compareUnsigned(h, buf(p)) < 0) buf(p) = h
        }
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) {
      if (portable) { if (b(p) < a(p)) a(p) = b(p) }
      else if (java.lang.Long.compareUnsigned(b(p), a(p)) < 0) a(p) = b(p)
      p += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numPerm * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numPerm)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAgg =
    copy(child = cs.head)
}

object MinHashAgg {
  /** Column API: minhash_agg over a LongType element-hash column. */
  def minhash_agg(c: Column, numPerm: Int, seed: Long): Column =
    Bridge.column(MinHashAgg(Bridge.expression(c), numPerm, seed)
      .toAggregateExpression())

  /** Portable variant: mod-(2^61-1) permutations over 32-bit element
    * hashes — exactly GraftHash.minhashMod's family, SQL-replicable. */
  def minhash_agg_mod(c: Column, numPerm: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(c), numPerm, 0L, portable = true)
      .toAggregateExpression())
}
