package graft

import graft.functions.SimdAffine

/** Kernel-level micro-bench for the H16 SIMD affine backend: times
  * `SimdAffine.affine` against the scalar loop in the exec's ACTUAL
  * access shape — ColumnarBatch-sized arrays (4096 rows, cache-warm,
  * like data just decoded by the parquet reader) iterated many times —
  * the isolation the end-to-end ScaleProbe CANNOT give
  * (vscore_columnar/vscore_row are parquet-scan-bound at every factor:
  * decode dominates, the per-row affine is ~1 ns either way, so the
  * probe honestly reads parity). A streaming variant over one large
  * array (every iteration missing cache) bounds the other end: there
  * the kernel is memory-bandwidth-bound and SIMD buys ~nothing —
  * printed too, so the SURVEY claim can name both regimes. Min-of-reps
  * on both paths; result checksums keep the JIT from dead-coding the
  * loops.
  *
  * Usage: runMain graft.SimdBench [batchRows] [iters]
  * (default 4096, 65536 → 256M rows/measurement)
  */
object SimdBench {
  def main(args: Array[String]): Unit = {
    val bn = args.headOption.map(_.toInt).getOrElse(4096)
    val iters = if (args.length > 1) args(1).toInt else 65536
    val m = 2654435761L
    val c = 1099511628211L
    // inputs bounded so a*m+c never overflows — the ANSI paths must
    // complete (the overflow branch is SimdSpec's job, not a timing's)
    def mkSrc(n: Int) = Array.tabulate(n)(i =>
      ((i.toLong * 0x9e3779b97f4a7c15L) >> 17) % (1L << 30))

    def scalar(src: Array[Long], n: Int, ansi: Boolean): Long = {
      val out = new Array[Long](n)
      var i = 0
      if (ansi) while (i < n) {
        out(i) = Math.addExact(Math.multiplyExact(src(i), m), c); i += 1
      } else while (i < n) { out(i) = src(i) * m + c; i += 1 }
      out(n - 1) ^ out(0)
    }
    def simd(src: Array[Long], n: Int, ansi: Boolean): Long = {
      val out = SimdAffine.affine(src, n, m, c, ansi)
      out(n - 1) ^ out(0)
    }

    def best(reps: Int)(f: () => Long): (Double, Long) = {
      var bestS = Double.MaxValue
      var sink = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        sink ^= f()
        bestS = math.min(bestS, (System.nanoTime() - t0) / 1e9)
      }
      (bestS, sink)
    }

    println(s"SIMD lanes=${SimdAffine.lanes}")
    // batch regime: the exec's shape — per-batch arrays, cache-warm
    val batch = mkSrc(bn)
    def loop(f: (Array[Long], Int, Boolean) => Long, ansi: Boolean)(): Long = {
      var k = 0L; var i = 0
      while (i < iters) { k ^= f(batch, bn, ansi); i += 1 }
      k
    }
    Seq(false, true).foreach { ansi =>
      val (ts, k1) = best(5)(loop(scalar, ansi))
      val (tv, k2) = best(5)(loop(simd, ansi))
      require(k1 == k2, "kernel results diverge")
      val rows = bn.toLong * iters
      println(f"batch   ${if (ansi) "ANSI  " else "LEGACY"} " +
        f"scalar=${ts / rows * 1e9}%.3fns/row simd=${tv / rows * 1e9}%.3fns/row " +
        f"speedup=${ts / tv}%.2fx")
    }
    // streaming regime: one big pass, every line missing cache
    val big = mkSrc(64 << 20)
    Seq(false, true).foreach { ansi =>
      val (ts, k1) = best(5)(() => scalar(big, big.length, ansi))
      val (tv, k2) = best(5)(() => simd(big, big.length, ansi))
      require(k1 == k2, "kernel results diverge")
      println(f"stream  ${if (ansi) "ANSI  " else "LEGACY"} " +
        f"scalar=${ts / big.length * 1e9}%.3fns/row simd=${tv / big.length * 1e9}%.3fns/row " +
        f"speedup=${ts / tv}%.2fx")
    }
  }
}
