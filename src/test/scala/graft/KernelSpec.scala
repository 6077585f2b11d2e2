package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.gf

/** Pins the fused md5-portable kernels (Md5H32, ShingleMd5H32,
  * SimHashMd5) to the composed built-in forms they replace. If these
  * hold on adversarial whitespace, the DuckDB oracle parity of the
  * dedup family is preserved by construction — the fused kernels are
  * pure drop-in evaluation strategies, not new semantics.
  */
class KernelSpec extends SparkSuite {

  // tokens with unicode + empties, separators with every ASCII ws char;
  // also leading/trailing runs — the split(-1) edge cases
  private val wordGen: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const("café"),
      Gen.const("日本語"), Gen.const("a-b_c"), Gen.const("x"))
  private val sepGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\r", "\f", " ", "  "))
      .map(_.mkString)
  private val textGen: Gen[String] = for {
    lead <- Gen.oneOf("", " ", "\t", "  \t")
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n, sepGen)
    trail <- Gen.oneOf("", " ", "\n", "\t ")
  } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString + trail

  private def runBoth(texts: Seq[String], fused: org.apache.spark.sql.Column,
      composed: org.apache.spark.sql.Column): Seq[(String, Any, Any)] = {
    import spark.implicits._
    texts.toDF("text").select(col("text"), fused.as("f"), composed.as("c"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSeq
  }

  private def escape(s: String): String =
    s.flatMap(c => if (c.isWhitespace && c != ' ') f"\\u${c.toInt}%04x" else c.toString)

  private def sampleTexts: Seq[String] = {
    val gens = Gen.listOfN(60, textGen).sample.getOrElse(Nil)
    gens ++ Seq("", " ", "\t", "a", "a b", "a b c d", "  spaced  out  ",
      "tab\tsep", "nl\nsep", "one two three four five")
  }

  test("Md5H32 == conv(substr(md5, 1, 8), 16, 10)") {
    val pairs = runBoth(sampleTexts, gf.h32(col("text")), gf.h32_builtin(col("text")))
    pairs.foreach { case (t, f, c) => assert(f == c, s"text=[${escape(t)}]") }
  }

  test("ShingleMd5H32 == array_distinct(transform(shingleStrings, h32))") {
    import graft.operators.TextOps
    val composed = array_distinct(transform(
      TextOps.shingleStrings(col("text")), s => gf.h32_builtin(s)))
    val pairs = runBoth(sampleTexts, gf.shingle_md5_h32(col("text"), 3), composed)
    pairs.foreach { case (t, f, c) =>
      // row.get returns mutable.ArraySeq for array columns; Seq == compares
      // elementwise across mutable/immutable, so no cast needed.
      assert(f == c, s"text=[${escape(t)}] fused=$f composed=$c")
    }
  }

  test("SimHashMd5 == packed simhash_ints of both md5 halves over split tokens") {
    val toks = split(trim(col("text")), "\\s+")
    val hHi = transform(toks, t => gf.h32_builtin(t))
    val hLo = transform(toks,
      t => conv(substring(md5(t.cast("binary")), 9, 8), 16, 10).cast("long"))
    val composed = shiftleft(gf.simhash_ints(hHi, 32), 32)
      .bitwiseOR(gf.simhash_ints(hLo, 32))
    val pairs = runBoth(sampleTexts, gf.simhash_md5(col("text")), composed)
    pairs.foreach { case (t, f, c) => assert(f == c, s"text=[${escape(t)}]") }
  }

  test("fused kernels agree with composed forms on the real documents table") {
    val docs = Tables.documents(spark, sf).limit(200)
    import graft.operators.TextOps
    val bad = docs.select(
      gf.shingle_md5_h32(col("text"), 3).as("f"),
      array_distinct(transform(TextOps.shingleStrings(col("text")),
        s => gf.h32_builtin(s))).as("c"))
      .filter(not(col("f") === col("c"))).count()
    assert(bad == 0)
  }
}
