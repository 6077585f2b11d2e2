package graft

import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.TextOps

class TextSpec extends SparkSuite {
  import spark.implicits._

  test("rolling hash is deterministic and content-sensitive") {
    val df = Seq("hello world", "hello world", "hello worle").toDF("t")
      .select(gf.rolling_hash64(col("t")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("shingle count = max(1, tokens - k + 1); whitespace-only = 0") {
    val df = Seq("a b c d e", "a b", "   ", "single").toDF("t")
      .select(size(gf.shingle_hashes(col("t"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 1, 0, 1))
  }

  test("minhash signature: fixed length, identical for identical sets, " +
    "mostly shared for overlapping sets") {
    val sig = gf.minhash_sig(gf.shingle_hashes(col("t"), 2), 128, 42L)
    val base = "the quick brown fox jumps over the lazy dog sits on a mat and sleeps all day long"
    val near = base + " extra"
    val far = "completely different content about spark query engines and distributed joins at scale"
    val rows = Seq(base, base, near, far).toDF("t").select(sig.as("s")).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0).length == 128)
    assert(rows(0) == rows(1)) // deterministic
    val sharedNear = rows(0).zip(rows(2)).count { case (a, b) => a == b }
    val sharedFar = rows(0).zip(rows(3)).count { case (a, b) => a == b }
    assert(sharedNear > 100, s"near-dup shares $sharedNear/128")
    assert(sharedFar < 20, s"unrelated shares $sharedFar/128")
  }

  test("simhash: near-identical texts within small hamming distance") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog and runs far away today"),
      ("b", "the quick brown fox jumps over the lazy dog and runs far away tonight"),
      ("c", "entirely unrelated words querying column stores with vectorized batch execution"))
      .toDF("id", "t").select($"id", gf.simhash64(col("t")).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val near = java.lang.Long.bitCount(m("a") ^ m("b"))
    val far = java.lang.Long.bitCount(m("a") ^ m("c"))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16)
  }

  test("hamming64 expression matches bitCount of xor") {
    val r = Seq((0xffL, 0x0fL)).toDF("a", "b")
      .select(gf.hamming64(col("a"), col("b"))).collect().head.getInt(0)
    assert(r == 4)
  }

  test("cosine_sim: orthogonal=0, identical=1, works on embeddings table") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f))).toDF("a", "b")
      .select(gf.cosine_sim(col("a"), col("b")).as("s"))
    val s = df.collect().map(_.getDouble(0))
    assert(math.abs(s(0)) < 1e-12)
    assert(math.abs(s(1) - 1.0) < 1e-12)
    val emb = Tables.embeddings(spark, sf)
    val self = emb.select(gf.cosine_sim(col("embedding"), col("embedding")).as("s"))
      .agg(min("s"), max("s")).collect().head
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-9)
  }

  test("expressions stay in whole-stage codegen (no CodegenFallback)") {
    val plan = Tables.documents(spark, sf)
      .select(gf.simhash64(col("text")), gf.rolling_hash64(col("text")))
      .queryExecution.executedPlan.toString
    // '*(n)' prefix marks a WholeStageCodegen stage in the plan string
    assert(plan.contains("*(1) Project"), plan)
  }

  test("lang_id emits only known labels and scores are consistent") {
    val out = TextOps.textLangId(spark, sf)
    val labels = out.select("lang_guess").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("fingerprint md5_norm invariant under whitespace/case changes") {
    val a = Seq("Hello   World", "hello world", "HELLO WORLD  ").toDF("text")
    val fps = a.select(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      .cast("binary")).as("f")).collect().map(_.getString(0))
    assert(fps.distinct.length == 1)
  }
}
