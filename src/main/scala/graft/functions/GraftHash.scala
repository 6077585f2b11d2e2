package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by the interpreted (`nullSafeEval`) and
  * codegen (`defineCodeGen`) paths of the graft Catalyst expressions.
  *
  * All kernels operate on Catalyst internal types (UTF8String bytes,
  * ArrayData) — zero boxing, zero copies beyond what the algorithm
  * needs — and are deterministic pure functions of their inputs, so
  * results are reproducible across any cluster layout/retry schedule.
  *
  * Algorithms are standard public constructions: polynomial rolling
  * hash (Karp–Rabin), splitmix64 finalizer (Steele et al., "Fast
  * Splittable Pseudorandom Number Generators"), MinHash with universal
  * hashing (Broder, "On the resemblance and containment of documents"),
  * SimHash (Charikar, "Similarity estimation techniques from rounding
  * algorithms").
  */
object GraftHash {

  /** Polynomial rolling hash over raw UTF-8 bytes (base 31). */
  def rolling64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31L * h + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — used to derive per-permutation hash params
    * and to whiten token hashes. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Hashes of the whitespace-delimited tokens of `s`, without
    * materializing token strings: a rolling hash is computed per token
    * directly over the byte stream. */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        var h = 1125899906842597L
        while (i < n && !isSpace(bytes(i))) {
          h = 31L * h + (bytes(i) & 0xff)
          i += 1
        }
        out += mix64(h)
      }
    }
    out.toArray
  }

  /** k-token shingle hashes: hash of each window of k consecutive token
    * hashes (order-sensitive). Fewer than k tokens → one hash of all
    * tokens. Output length = max(1, n_tokens - k + 1) for nonempty
    * input, 0 for whitespace-only input. */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val toks = tokenHashes(s)
    if (toks.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val kk = math.min(k, toks.length)
    val m = toks.length - kk + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = 0
      while (j < kk) {
        h = h * 0x100000001b3L ^ toks(i + j)
        j += 1
      }
      out(i) = mix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over a set of element hashes: sig(i) =
    * min over x of (a_i * x + b_i), unsigned order; a_i,b_i derived
    * from splitmix64(seed, i). Empty input → all Long.MaxValue. */
  def minhash(elems: ArrayData, numPerm: Int, seed: Long): ArrayData = {
    val n = elems.numElements()
    val sig = new Array[Long](numPerm)
    var p = 0
    while (p < numPerm) {
      val a = mix64(seed + 2L * p) | 1L // odd multiplier
      val b = mix64(seed + 2L * p + 1)
      var best = -1L // unsigned max
      var i = 0
      while (i < n) {
        val v = a * elems.getLong(i) + b
        if (java.lang.Long.compareUnsigned(v, best) < 0) best = v
        i += 1
      }
      sig(p) = if (n == 0) Long.MaxValue else best
      p += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhash64(s: UTF8String): Long = {
    val toks = tokenHashes(s)
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = toks(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Cosine similarity of two float vectors, accumulated in double.
    * Mismatched lengths or zero-norm → 0.0 (callers filter). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane sign bits (Charikar LSH for cosine): bit j is
    * the sign of the dot product with a pseudo-random hyperplane whose
    * coefficients derive from splitmix64(seed, j, dim). Identical
    * vectors → identical buckets for any seed, so exact-duplicate
    * recall is 1.0 by construction. */
  def signBits(v: ArrayData, numBits: Int, seed: Long): Long = {
    val n = v.numElements()
    var out = 0L
    var j = 0
    while (j < numBits) {
      val base = seed + j.toLong * 0x9e3779b97f4a7c15L
      var dot = 0.0
      var i = 0
      while (i < n) {
        // mix64 output treated as signed 64-bit → symmetric coefficient
        dot += v.getFloat(i).toDouble * (mix64(base + i).toDouble / 9.223372036854776e18)
        i += 1
      }
      if (dot > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Euclidean (L2) distance of two float vectors in double. */
  def l2F(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.PositiveInfinity
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }
}
