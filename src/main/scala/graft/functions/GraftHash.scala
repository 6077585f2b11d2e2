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

  // ------------------------------------------------------------------
  // Portable kernels: exact integer arithmetic reproducible in ANSI-ish
  // SQL (DuckDB), so the pipelines built on them are fully
  // oracle-checkable. Element hashes are 32-bit (md5-derived, computed
  // upstream with built-in expressions); permutations are universal
  // hashes mod the Mersenne prime 2^61-1 — every intermediate fits in a
  // signed 64-bit integer in both engines.
  // ------------------------------------------------------------------

  /** Mersenne prime 2^61-1: modulus of the portable permutations. */
  val P61: Long = 2305843009213693951L

  /** Portable per-permutation multiplier: 1 + ((j+1)*2654435761) mod 2^30.
    * < 2^30, so a*h < 2^62 for 32-bit h — no overflow. */
  def permA(j: Int): Long = 1L + ((j + 1L) * 2654435761L) % 1073741824L

  /** Portable per-permutation offset: ((j+1)*1099511628211) mod P61. */
  def permB(j: Int): Long = ((j + 1L) * 1099511628211L) % P61

  /** Portable MinHash signature over 32-bit element hashes:
    * sig(j) = min over x of (permA(j)*x + permB(j)) mod P61.
    * Empty input → all P61 (so empty docs never fake similarity). */
  def minhashMod(elems: ArrayData, numPerm: Int): ArrayData = {
    val n = elems.numElements()
    val sig = new Array[Long](numPerm)
    var j = 0
    while (j < numPerm) {
      val a = permA(j)
      val b = permB(j)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * elems.getLong(i) + b) % P61
        if (v < best) best = v
        i += 1
      }
      sig(j) = if (n == 0) P61 else best
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Portable SimHash over pre-hashed elements: accumulate ±1 per bit
    * of each element hash over the low `bits` bits, emit sign bits.
    * Empty input → 0. */
  def simhashInts(elems: ArrayData, bits: Int): Long = {
    val n = elems.numElements()
    val acc = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = elems.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Squared L2 distance of two long vectors (exact integer). */
  def l2sqLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) return Long.MaxValue
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Portable ±1 hyperplane coefficient for (global plane p, dim d):
    * +1 iff ((p*4096+d)*2654435761) mod 2^31 < 2^30. Pure integer —
    * both engines agree exactly. */
  def planeCoeff(p: Int, d: Int): Int =
    if (((p * 4096L + d) * 2654435761L) % 2147483648L < 1073741824L) 1 else -1

  /** Portable sign-LSH bucket of a float vector: dims quantized to
    * floor(x*1e6) longs (identical in any engine from the same float),
    * integer dot with planeCoeff hyperplanes, bit j = (dot > 0).
    * `planeBase` offsets the global plane index per hash table. */
  def signBitsQ(v: ArrayData, numBits: Int, planeBase: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var j = 0
    while (j < numBits) {
      val p = planeBase + j
      var dot = 0L
      var i = 0
      while (i < n) {
        val q = math.floor(v.getFloat(i).toDouble * 1000000.0).toLong
        dot += q * planeCoeff(p, i)
        i += 1
      }
      if (dot > 0) out |= 1L << j
      j += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Fused md5-portable kernels. Bit-identical to the built-in
  // expression compositions they replace (verified by KernelSpec
  // property tests against the composed forms):
  //   md5H32(s)           == conv(substr(md5(s), 1, 8), 16, 10)
  //   shingleMd5H32(s, k) == array_distinct(transform(shingleStrings(s), h32))
  //   simhashMd5(s)       == simhash of md5-h32 halves of split(trim(s),'\s+')
  // One md5 digest per token/shingle via a thread-local MessageDigest —
  // no hex strings, no conv parse, no intermediate string arrays.
  // ------------------------------------------------------------------

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 4 digest bytes as an unsigned 32-bit value (== the first 8
    * hex chars of md5 parsed base-16). */
  private def beU32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)

  /** md5-h32 of a string's UTF-8 bytes — the portable 32-bit hash the
    * DuckDB oracles share: ('0x' || substr(md5(s),1,8))::BIGINT. */
  def md5H32(s: UTF8String): Long = {
    val md = md5TL.get()
    md.reset()
    md.update(s.getBytes)
    beU32(md.digest(), 0)
  }

  /** Byte ranges of split(trim(s), "\s+") with Java limit=-1 semantics
    * over ASCII whitespace: trim strips 0x20 only; a leading whitespace
    * run yields a leading empty token, a trailing run a trailing empty
    * one; empty/space-only input yields one empty token. Multi-byte
    * UTF-8 is safe (continuation bytes are >= 0x80, never whitespace).
    * Returns flattened (offset, length) pairs. */
  private def splitRanges(bytes: Array[Byte]): Array[Int] = {
    var s = 0
    var e = bytes.length
    while (s < e && bytes(s) == ' ') s += 1
    while (e > s && bytes(e - 1) == ' ') e -= 1
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    if (s == e) { out += s; out += 0 }
    else {
      var cur = s
      var i = s
      while (i < e) {
        if (isSpace(bytes(i))) {
          out += cur; out += (i - cur)
          while (i < e && isSpace(bytes(i))) i += 1
          cur = i
        } else i += 1
      }
      out += cur; out += (e - cur)
    }
    out.toArray
  }

  /** Distinct (first-occurrence order) md5-h32 hashes of the k-token
    * shingles of s: tokens joined by single spaces per window; fewer
    * than k tokens → one shingle of all tokens. Fused equivalent of
    * array_distinct(transform(shingleStrings(s), h32)). */
  def shingleMd5H32(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val r = splitRanges(bytes)
    val ntok = r.length / 2
    val kk = math.min(k, ntok)
    val m = ntok - kk + 1
    val md = md5TL.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w < m) {
      md.reset()
      var j = 0
      while (j < kk) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes, r(2 * (w + j)), r(2 * (w + j) + 1))
        j += 1
      }
      seen.add(beU32(md.digest(), 0))
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit portable SimHash: two 32-bit SimHashes packed (hi << 32 |
    * lo), where per token the hi half accumulates md5 digest bytes 0-3
    * (== h32) and the lo half bytes 4-7 (hex chars 9-16). Band-friendly
    * (4×16-bit slices) and exactly reproducible in SQL from
    * substr(md5(t),1,8) / substr(md5(t),9,8). Empty token set → 0. */
  def simhashMd5(s: UTF8String): Long = {
    val bytes = s.getBytes
    val r = splitRanges(bytes)
    val ntok = r.length / 2
    val acc = new Array[Int](64) // 0-31 lo half, 32-63 hi half
    val md = md5TL.get()
    var t = 0
    while (t < ntok) {
      md.reset()
      md.update(bytes, r(2 * t), r(2 * t + 1))
      val d = md.digest()
      val hHi = beU32(d, 0)
      val hLo = beU32(d, 4)
      var j = 0
      while (j < 32) {
        if (((hLo >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        if (((hHi >>> j) & 1L) == 1L) acc(32 + j) += 1 else acc(32 + j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
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
