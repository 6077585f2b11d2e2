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

  test("qdigest early exit ≡ the full 20-round unroll (adversarial multisets)") {
    import spark.implicits._
    // independent driver-side reference: the FULL 20-round dyadic
    // compression with no early exit — the round-9 engine skips rounds
    // once the carry relation drains to ≤1 node, and this pins that
    // the skip is value-neutral on the shapes that exercise each tail:
    //   - carry drains to EMPTY mid-tree (uniform mass)
    //   - single carried node with c ≥ t (emitted at the exit level)
    //   - single carried node with c < t (lifted to the root id)
    //   - mass exactly AT the threshold boundary
    def ref(leaves: Map[Long, Long]): Seq[(Int, Long, Long, Long, Long)] = {
      val n = leaves.values.sum
      val t = math.max(1L, n / 1024)
      var cur = leaves
      var digest = Vector.empty[(Int, Long, Long, Long)] // lvl, id, c, ub
      for (l <- 0 until 20) {
        val (emit, carry) = cur.partition(_._2 >= t)
        digest ++= emit.toSeq.map { case (id, c) =>
          (l, id, c, (id + 1) * (1L << l) - 1) }
        cur = carry.groupMapReduce(_._1 / 2)(_._2)(_ + _)
      }
      digest ++= cur.filter(_._2 > 0).toSeq.map { case (id, c) =>
        (20, id, c, (id + 1) * (1L << 20) - 1) }
      val sorted = digest.sortBy(d => (d._4, d._1))
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      Seq(1, 5, 25, 50, 75, 95, 99).map { p =>
        val target = (p * n + 99) / 100
        val ub = sorted.zip(cums).filter(_._2 >= target).map(_._1._4).min
        (p, target, ub * 16 + 15, digest.size.toLong, t)
      }
    }
    def got(leaves: Map[Long, Long]): Seq[(Int, Long, Long, Long, Long)] =
      SketchOps.qdigestFromLeaves(
        leaves.toSeq.toDF("id", "c")).collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
    val cases = Seq(
      // single leaf: c = n ≥ t → emitted at level 0 on the first test
      Map(5L -> 100L),
      // heavy node + remote light node: light carries alone with
      // c < t until the root — the root-lift tail
      Map(0L -> 20480L, 900000L -> 1L),
      // heavy + remote pair that MERGES above the threshold partway
      // up: single-node c ≥ t at the exit level
      Map(0L -> 20480L, 800000L -> 6L, 800001L -> 6L),
      // uniform mass that drains completely mid-tree
      (0L until 64L).map(i => i -> 64L).toMap,
      // exact threshold boundary: c == t emits, c == t-1 carries
      Map(0L -> 1024L, 1L -> 1023L, 1000L -> 1L),
      // adversarial mixed multiset
      Map(3L -> 7L, 17L -> 1L, 1048575L -> 3L, 524288L -> 900L,
        12L -> 88L, 13L -> 12L),
      // unit leaves spaced 4 apart: t = 2, first level where any
      // node reaches threshold is 3 → the universe-probe jump skips
      // levels 0-2 and must land on the identical carry
      (0L until 3000L).map(i => i * 4 -> 1L).toMap,
      // unit leaves spaced 1024 apart: t = 2, nothing merges until
      // level 11 — the deep-jump case (L_first = 11)
      (0L until 2048L).map(i => i * 1024 -> 1L).toMap)
    cases.foreach { leaves =>
      assert(got(leaves) == ref(leaves), s"divergence on $leaves")
    }
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

  test("HLL registers merge: sketch(A) max sketch(B) == sketch(A ∪ B)") {
    // the property that makes the sketch USEFUL as data: per-partition
    // (or per-day) sketches re-aggregate by register max into exactly
    // the sketch the union of the raw data would produce
    val events = Tables.events(spark, sf)
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ra = regMap(SketchOps.hllRegisters(a, col("event_type"), col("user_id")))
    val rb = regMap(SketchOps.hllRegisters(b, col("event_type"), col("user_id")))
    val merged = (ra.keySet ++ rb.keySet).map { k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))
    }.toMap
    val full = regMap(SketchOps.hllRegisters(events, col("event_type"), col("user_id")))
    assert(merged == full)
  }

  test("KMV set-op estimates track exact union/intersection/jaccard") {
    import spark.implicits._
    val d = Tables.documents(spark, sf)
      .select(col("source"), explode(gf.shingle_md5_h32(col("text"), 3)).as("h"))
      .distinct()
    val sets = d.collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(1)).toSet }
    val out = SketchOps.sketchKmvSetops(spark, sf).collect()
    assert(out.length == sets.size * (sets.size - 1) / 2)
    out.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val (a, b) = (sets(s1), sets(s2))
      val exactU = (a ++ b).size.toDouble
      val exactJ = (a & b).size.toDouble / exactU
      val estU = r.getAs[Double]("est_union")
      val estJ = r.getAs[Double]("est_jaccard")
      // k=64 ⇒ ~1/√62 ≈ 13% standard error on the union; allow ~3σ
      assert(math.abs(estU - exactU) <= math.max(5.0, 0.45 * exactU),
        s"$s1×$s2 union: est=$estU exact=$exactU")
      assert(math.abs(estJ - exactJ) <= 0.25,
        s"$s1×$s2 jaccard: est=$estJ exact=$exactJ")
    }
  }

  test("HLL estimate tracks exact distinct within sketch error bounds") {
    val out = SketchOps.sketchHllDistinct(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact")
      // m=32 ⇒ ~18% standard error; allow 3σ
      assert(est > 0 && math.abs(est - exact) <= math.max(3.0, 0.55 * exact),
        s"${r.getString(0)}: est=$est exact=$exact")
      // register vector is the materialized sketch: exactly 32 cells
      assert(r.getAs[String]("registers").split(",").length == 32)
    }
  }
}
