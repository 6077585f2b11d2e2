package graft.functions

/** Runtime guard for the Panama vector API (`jdk.incubator.vector`).
  *
  * The module is an incubator: it exists in every JDK 17+ but is only
  * linked into a JVM launched with `--add-modules=jdk.incubator.vector`
  * (build.sbt adds the flag to every forked run/test JVM). The SIMD
  * kernels live in [[SimdAffine]], whose class initialization touches
  * Panama classes — callers must check [[SimdSupport.available]] first
  * so a JVM without the module degrades to the scalar loop instead of
  * dying with NoClassDefFoundError. This keeps the driver contract
  * (Verify/Bench under arbitrary launchers) robust: SIMD is a
  * performance lane, never a correctness dependency.
  */
object SimdSupport {
  lazy val available: Boolean =
    try {
      Class.forName("jdk.incubator.vector.LongVector")
      true
    } catch { case _: Throwable => false }
}

/** Panama-vectorized affine kernel `a * m + c` over long lanes — the
  * SIMD backend the H16 columnar lane exists to host (ColumnarAffine
  * carried the measured note that the scalar columnar loop only ties
  * the codegen row path; the slope separates under a vector kernel).
  *
  * Semantics are BIT-IDENTICAL to the scalar paths:
  *   - LEGACY mode: two's-complement wrap, exactly `a * m + c` on
  *     longs — the vector `mul/add` lanewise ops wrap the same way.
  *   - ANSI mode: overflow must raise like `Math.multiplyExact/
  *     addExact`. Lanes are pre-screened against the CONSERVATIVE safe
  *     interval [lo, hi] of inputs for which `a*m+c` provably cannot
  *     overflow (computed once per (m, c) from exact integer division
  *     bounds); any vector span with a lane outside the interval is
  *     re-run through the scalar exact ops, which either compute the
  *     same value (false alarm at the interval edge) or raise the ANSI
  *     ArithmeticException. Correctness therefore never depends on the
  *     interval being tight — `SimdSpec` pins equality against the
  *     scalar exact semantics across random + boundary inputs.
  *
  * The kernel operates on plain long arrays (the caller bulk-copies
  * the scan vector via `ColumnVector.getLongs` and bulk-writes via
  * `putLongs`) so the hot loop is a straight-line species-width walk.
  */
object SimdAffine {
  import jdk.incubator.vector.{LongVector, VectorOperators, VectorSpecies}

  private val SP: VectorSpecies[java.lang.Long] = LongVector.SPECIES_PREFERRED

  /** SIMD lane count (8 on AVX-512, 4 on AVX2, 2 on NEON). */
  def lanes: Int = SP.length()

  private def ceilDiv(x: Long, y: Long): Long = {
    val q = Math.floorDiv(x, y)
    if (q * y == x) q else q + 1
  }

  /** Conservative interval [lo, hi] of inputs `a` for which
    * `a * m + c` cannot overflow a long. Outside lanes fall to the
    * scalar exact path, so a shrunk bound costs speed, never
    * correctness. */
  private[functions] def safeRange(m: Long, c: Long): (Long, Long) = {
    // product target interval after reserving room for the add
    val pMax = if (c > 0) Long.MaxValue - c else Long.MaxValue
    val pMin = if (c < 0) Long.MinValue - c else Long.MinValue
    if (m == 0) (Long.MinValue, Long.MaxValue)
    else if (m == -1)
      // -a: exclude Long.MinValue (negation overflows); -pMin would
      // itself overflow when pMin is Long.MinValue — that bound is
      // then vacuous
      (Math.max(-pMax, Long.MinValue + 1),
        if (pMin == Long.MinValue) Long.MaxValue else -pMin)
    else if (m > 0) (ceilDiv(pMin, m), Math.floorDiv(pMax, m))
    else (ceilDiv(pMax, m), Math.floorDiv(pMin, m)) // m < -1 flips
  }

  /** Test hook: the ANSI safe interval (SimdSpec pins that it never
    * admits an overflowing input). */
  private[graft] def testSafeRange(m: Long, c: Long): (Long, Long) =
    safeRange(m, c)

  /** `out(i) = src(i) * m + c` for i < n; ANSI raises on overflow with
    * the exact-op semantics. */
  def affine(src: Array[Long], n: Int, m: Long, c: Long,
      ansi: Boolean): Array[Long] = {
    val out = new Array[Long](n)
    val bound = SP.loopBound(n)
    var i = 0
    if (ansi) {
      val (lo, hi) = safeRange(m, c)
      while (i < bound) {
        val v = LongVector.fromArray(SP, src, i)
        if (v.compare(VectorOperators.GT, hi).anyTrue() ||
            v.compare(VectorOperators.LT, lo).anyTrue()) {
          var j = i
          val e = i + SP.length()
          while (j < e) {
            out(j) = Math.addExact(Math.multiplyExact(src(j), m), c)
            j += 1
          }
        } else v.mul(m).add(c).intoArray(out, i)
        i += SP.length()
      }
      while (i < n) {
        out(i) = Math.addExact(Math.multiplyExact(src(i), m), c)
        i += 1
      }
    } else {
      while (i < bound) {
        LongVector.fromArray(SP, src, i).mul(m).add(c).intoArray(out, i)
        i += SP.length()
      }
      while (i < n) { out(i) = src(i) * m + c; i += 1 }
    }
    out
  }
}
