package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimdAffine, SimdSupport}

/** Pins the SIMD affine kernel (jdk.incubator.vector) to the scalar
  * exact semantics the columnar lane previously ran — bit-equality in
  * LEGACY (two's-complement wrap) and exception-equality in ANSI
  * (Math.multiplyExact/addExact), across random and boundary inputs.
  * Correctness must never depend on the ANSI safe-interval being
  * tight, so the generator salts in values at and around the interval
  * edges and Long.{Min,Max}Value. */
class SimdSpec extends AnyFunSuite {

  test("jdk.incubator.vector is linked in the test JVM") {
    assert(SimdSupport.available,
      "build.sbt must pass --add-modules=jdk.incubator.vector to forked JVMs")
  }

  private val edgy: Gen[Long] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.choose(-1000L, 1000L),
    Gen.oneOf(Long.MinValue, Long.MinValue + 1, Long.MaxValue,
      Long.MaxValue - 1, 0L, 1L, -1L))

  private val mc: Gen[(Long, Long)] = for {
    m <- Gen.oneOf(Gen.choose(-5L, 5L), Gen.oneOf(Long.MinValue, -1L, 0L, 1L,
      Long.MaxValue, 2654435761L, -2654435761L), edgy)
    c <- Gen.oneOf(Gen.choose(-5L, 5L), edgy)
  } yield (m, c)

  private def scalarAnsi(src: Array[Long], m: Long, c: Long): Either[Unit, Array[Long]] =
    try Right(src.map(a => Math.addExact(Math.multiplyExact(a, m), c)))
    catch { case _: ArithmeticException => Left(()) }

  private def simdAnsi(src: Array[Long], m: Long, c: Long): Either[Unit, Array[Long]] =
    try Right(SimdAffine.affine(src, src.length, m, c, ansi = true))
    catch { case _: ArithmeticException => Left(()) }

  test("LEGACY: SIMD kernel wraps exactly like the scalar loop") {
    val cases = Gen.listOfN(200,
      for { p <- mc; xs <- Gen.listOfN(37, edgy) } yield (p, xs))
      .sample.getOrElse(Nil)
    assert(cases.size >= 150)
    cases.foreach { case ((m, c), xs) =>
      val src = xs.toArray
      val got = SimdAffine.affine(src, src.length, m, c, ansi = false)
      val want = src.map(a => a * m + c)
      assert(java.util.Arrays.equals(got, want), s"m=$m c=$c")
    }
  }

  test("ANSI: SIMD kernel computes or raises exactly like the exact ops") {
    val cases = Gen.listOfN(300,
      for { p <- mc; xs <- Gen.listOfN(37, edgy) } yield (p, xs))
      .sample.getOrElse(Nil)
    assert(cases.size >= 200)
    var overflowCases = 0
    cases.foreach { case ((m, c), xs) =>
      val src = xs.toArray
      (scalarAnsi(src, m, c), simdAnsi(src, m, c)) match {
        case (Right(w), Right(g)) =>
          assert(java.util.Arrays.equals(g, w), s"m=$m c=$c")
        case (Left(_), Left(_)) => overflowCases += 1
        case (w, g) => fail(s"m=$m c=$c: scalar=$w simd=$g disagree on raise")
      }
    }
    // the generator must actually exercise the overflow lane
    assert(overflowCases > 10, s"only $overflowCases overflow cases generated")
  }

  test("ANSI: every value inside safeRange is provably exact-safe") {
    val probe = Gen.listOfN(300, mc).sample.getOrElse(Nil)
    assert(probe.size >= 200)
    probe.foreach { case (m, c) =>
      val (lo, hi) = SimdAffine.testSafeRange(m, c)
      // the interval may be conservative but must never include an
      // overflowing input: test its edges and interior points
      Seq(lo, hi, lo / 2 + hi / 2, if (lo <= 0 && hi >= 0) 0L else lo)
        .filter(a => a >= lo && a <= hi)
        .foreach { a =>
          try Math.addExact(Math.multiplyExact(a, m), c)
          catch { case _: ArithmeticException =>
            fail(s"safeRange($m,$c)=[$lo,$hi] admits overflowing a=$a") }
        }
    }
  }
}
