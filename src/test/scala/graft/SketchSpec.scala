package graft

import org.apache.spark.sql.functions._
import graft.functions.{gf, GraftHash, MinHashAgg}
import graft.operators.SketchOps
import org.apache.spark.unsafe.types.UTF8String

class SketchSpec extends SparkSuite {

  test("MinHashAgg is independent of partitioning (merge correctness)") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), gf.rolling_hash64(col("text")).as("h"))
    def sigOf(parts: Int) = docs.repartition(parts)
      .groupBy("source")
      .agg(MinHashAgg.minhash_agg(col("h"), 64, 42L).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigOf(1) == sigOf(8))
  }

  test("MinHashAgg of identical element sets gives identical signatures") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 3L), ("b", 1L), ("b", 2L))
      .toDF("g", "h")
      .groupBy("g").agg(MinHashAgg.minhash_agg(col("h"), 32, 7L).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](1))
    assert(sigs(0) == sigs(1))
  }

  test("source similarity emits all source pairs with estimates in [0,1]") {
    val out = SketchOps.sketchSourceSimilarity(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.length == nSources * (nSources - 1) / 2)
    assert(out.forall { r =>
      val e = r.getAs[Double]("est_jaccard"); e >= 0.0 && e <= 1.0
    })
    // distinct word-soup sources share no identical documents → low sim
    assert(out.forall(_.getAs[Double]("est_jaccard") < 0.5))
  }

  test("bloom prefilter: superset of the exact semi-join, no false negatives") {
    val approx = SketchOps.bloomPrefilter(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val exact = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(approx),
      s"false negatives: ${(exact -- approx).take(5)}")
    // and the sketch should not be uselessly permissive at this size
    val universe = Tables.customer(spark, sf).count()
    assert(approx.size < universe || exact.size == universe)
  }

  test("kernel properties: hamming bounds/symmetry, cosine range, mix64 avalanche") {
    val rnd = new scala.util.Random(1)
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val h = GraftHash.hamming64(a, b)
      assert(h >= 0 && h <= 64)
      assert(h == GraftHash.hamming64(b, a))
      assert(GraftHash.hamming64(a, a) == 0)
      // avalanche: flipping one input bit changes ~half the output bits
      val m1 = GraftHash.mix64(a); val m2 = GraftHash.mix64(a ^ 1L)
      assert(GraftHash.hamming64(m1, m2) > 8)
    }
    (1 to 50).foreach { _ =>
      val s = UTF8String.fromString(
        (1 to rnd.nextInt(20) + 1).map(_ => "w" + rnd.nextInt(30)).mkString(" "))
      val toks = GraftHash.tokenHashes(s)
      assert(toks.length == s.toString.split("\\s+").length)
    }
  }

  test("minhash estimate tracks true jaccard (kernel-level)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val setA = (1L to 100L).map(GraftHash.mix64).toArray
    val setB = (51L to 150L).map(GraftHash.mix64).toArray // true J = 50/150
    val sa = GraftHash.minhash(new GenericArrayData(setA), 256, 9L)
    val sb = GraftHash.minhash(new GenericArrayData(setB), 256, 9L)
    val matches = (0 until 256).count(i => sa.getLong(i) == sb.getLong(i))
    val est = matches / 256.0
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est=$est true=0.333")
  }
}
