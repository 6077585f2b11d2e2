package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators.{AnnOps, Round10bOps, Round16Ops, Round17Ops, Round18Ops, Round19Ops}
import graft.sources.SegmentStore

/** Round 19 — tombstone deletes + delete-aware compaction for the
  * capped ANN substrate (E33): search excludes a tombstoned vector
  * IMMEDIATELY, compaction drops it PHYSICALLY and repairs exactly the
  * rep-losing buckets, compact ∘ delete ≡ rebuild-minus bit-for-bit,
  * the kept-edges lemma holds executable, and E32's segment-locality
  * is REFUTED for the delete direction (a promoted rep never lived in
  * any rep segment). */
class Round19Spec extends SparkSuite {

  /** The Round16-18Spec synthetic raw embeddings (n × 64). */
  private def synthEmbN(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until 64).map { j =>
        ((gf.h32(concat(lit("e:"), col("id").cast("string"),
          lit(s":$j"))) % 2001 - 1000).cast("double") / 8000.0)
          .cast("float")
      }: _*).as("embedding"))

  /** A compacted single-epoch capped state over the synthetic
    * clustered corpus: (emb, buckets, reps, standing graph, tomb). */
  private def compactedState
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val cemb = Round16Ops.clusteredEmbOver(synthEmbN(320))
      .localCheckpoint(true)
    val emb = cemb.select(col("vec_id"), col("v").as("embedding"))
      .localCheckpoint(true)
    val b = AnnOps.signBucketsQ(emb, "vec_id", 4, 8)
      .select(col("table_id"), col("bucket"), col("vec_id"))
      .localCheckpoint(true)
    val rc = Round17Ops.epochReps(b.withColumn("epoch", lit(0L)),
      Round17Ops.epochCap).localCheckpoint(true)
    val standing = Round18Ops.compactFromReps(emb, b, rc)
      .localCheckpoint(true)
    val tomb = cemb.filter(Round19Ops.tombstonePred)
      .select(col("vec_id")).localCheckpoint(true)
    (emb, b, rc, standing, tomb)
  }

  private def graphRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("E33 compaction: compact ∘ delete over the tombstoned state " +
      "equals the fresh capped rebuild over the survivor corpus " +
      "bit-for-bit, the repair is SURGICAL (untouched standing lists " +
      "pass through), and the corpus exercises real rep churn") {
    val (emb, b, rc, standing, tomb) = compactedState
    val (bSurv, reps2, graph2) =
      Round19Ops.tombstoneCompactState(emb, b, rc, standing, tomb)
    val embSurv = emb.join(tomb, Seq("vec_id"), "left_anti")
    val fresh = graphRows(Round16Ops.knnGraphBuildCapped(
      embSurv, Round17Ops.epochCap))
    val got = graphRows(graph2)
    assert(got == fresh,
      s"compact∘delete diverged from rebuild-minus: extra " +
        s"${(got -- fresh).take(5)}, missing ${(fresh -- got).take(5)}")
    // churn is real: some bucket lost a rep...
    val deletedReps = rc.join(tomb.select(col("vec_id").as("dst")),
      Seq("dst"), "left_semi")
    assert(deletedReps.count() > 0,
      "no rep was tombstoned — every repair pin below is vacuous")
    // ...and the repair was surgical, not a whole-graph rebuild: the
    // pass-through (standing rows surviving verbatim) is non-empty
    val passThrough = standing
      .join(tomb.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(graph2, Seq("src", "rank", "dst", "sim"), "left_semi")
    assert(passThrough.count() > 0, "no standing row passed through")
    // surviving buckets carry no tombstoned member
    assert(bSurv.join(tomb, Seq("vec_id"), "left_semi").count() == 0)
    // repaired reps carry no tombstoned vector
    assert(reps2.join(tomb.select(col("vec_id").as("dst")), Seq("dst"),
      "left_semi").count() == 0)
  }

  test("E33 segment-locality REFUTED for deletes: the repaired rep " +
      "set PROMOTES a member that was never in any rep segment — the " +
      "delete compaction must read bucket members, not rep segments " +
      "(E32's containment lemma does not dualize)") {
    val (emb, b, rc, standing, tomb) = compactedState
    val (_, reps2, _) =
      Round19Ops.tombstoneCompactState(emb, b, rc, standing, tomb)
    val promoted = reps2.join(rc, Seq("table_id", "bucket", "dst"),
      "left_anti")
    assert(promoted.count() > 0,
      "no rep was promoted from below the cap — the corpus never " +
        "deletes a rep of an over-cap bucket and the refutation is " +
        "vacuous")
    // and the promotion matters: ranking within the rep SEGMENTS only
    // (E32's compactReps over rc minus tombstones) misses it
    val segOnly = Round18Ops.compactReps(
      rc.join(tomb.select(col("vec_id").as("dst")), Seq("dst"),
        "left_anti"))
    assert(promoted.join(segOnly, Seq("table_id", "bucket", "dst"),
      "left_semi").count() == 0,
      "the 'promoted' reps were derivable from rep segments after all")
  }

  test("E33 kept-edges lemma, executable: every standing edge whose " +
      "dst was tombstoned has its src among the surviving members of " +
      "a rep-losing bucket — so the pass-through can never carry a " +
      "deleted dst") {
    val (emb, b, rc, standing, tomb) = compactedState
    val changedBk = rc
      .join(tomb.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      .select(col("table_id"), col("bucket")).distinct()
    val affected = b.join(tomb, Seq("vec_id"), "left_anti")
      .join(changedBk, Seq("table_id", "bucket"), "left_semi")
      .select(col("vec_id").as("src")).distinct()
    val orphan = standing
      .join(tomb.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      .join(tomb.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(affected, Seq("src"), "left_anti")
    assert(orphan.count() == 0,
      "a surviving src holds a tombstoned dst but is NOT re-scored — " +
        "the kept-edges lemma is violated and the pass-through leaks " +
        "deleted vectors")
    // non-vacuous: deleted dsts do appear in the standing graph
    assert(standing.join(tomb.select(col("vec_id").as("dst")),
      Seq("dst"), "left_semi").count() > 0,
      "no standing edge pointed at a tombstoned dst")
    val _ = emb
  }

  test("E33 on the sf corpus: search excludes tombstoned vectors " +
      "IMMEDIATELY (pre-compaction merge filter); compaction drops " +
      "them PHYSICALLY from every store family and consumes the " +
      "tombstone segment; and the staged operator equals the " +
      "in-engine rebuild-minus search") {
    val tombIds = Round16Ops.clusteredEmb(spark, sf)
      .filter(Round19Ops.tombstonePred)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(tombIds.contains(2L), "query vector 2 must be tombstoned")
    // (1) immediate exclusion on the LIVE store, before compaction
    val live = Round19Ops.searchWithLiveTombstones(spark, sf)
      .localCheckpoint(true)
    assert(live.count() > 0)
    assert(live.filter(col("qid").isin(tombIds.toSeq: _*) ||
      col("nid").isin(tombIds.toSeq: _*)).count() == 0,
      "pre-compaction search returned a tombstoned vector")
    // (2) physical drop: the compacted store has no tombstoned id in
    // any family, and no tombstone segment survived the compaction
    val dir = Round19Ops.tombstoneDir(spark, sf)
    val families = Map(
      "buckets" -> SegmentStore.read(spark, s"$dir/buckets")
        .select(col("vec_id")),
      "reps" -> SegmentStore.read(spark, s"$dir/reps")
        .select(col("dst").as("vec_id")),
      "standing_src" -> spark.read.parquet(s"$dir/standing")
        .select(col("src").as("vec_id")),
      "standing_dst" -> spark.read.parquet(s"$dir/standing")
        .select(col("dst").as("vec_id")))
    families.foreach { case (name, ids) =>
      val leaked = ids.filter(col("vec_id").isin(tombIds.toSeq: _*))
        .count()
      assert(leaked == 0, s"$name still holds $leaked tombstoned ids " +
        "after compaction — the drop is not physical")
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tombstones")),
      "the tombstone segment was carried into the compacted store")
    // (3) the operator ≡ the rebuild-minus search, in-engine
    val got = Round19Ops.annTombstoneCompact(spark, sf)
    val want = Round19Ops.rebuildMinusSearch(spark, sf)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val (g, w) = (rows(got), rows(want))
    assert(g == w, s"operator diverged from rebuild-minus: extra " +
      s"${(g -- w).take(5)}, missing ${(w -- g).take(5)}")
    assert(!g.exists(r => tombIds.contains(r._1) ||
      tombIds.contains(r._3)),
      "the compacted search returned a tombstoned vector")
  }

  // --------------------------- B83/B85 basket-fanout guard (item #8)

  test("basket-size cap: INERT on the sf corpus (fast path — the " +
      "guard returns the input relation unchanged, so the shipped " +
      "q_item_cf/q_assoc_rules plans gain nothing); a planted " +
      "oversized basket trims to exactly the cap items minimizing " +
      "the salted hash, with under-cap baskets untouched") {
    import spark.implicits._
    // inert on the real corpus: no basket exceeds the cap, and the
    // fast path is REFERENCE equality — zero plan change
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().localCheckpoint(true)
    val maxBasket = baskets.groupBy(col("o")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).first().getLong(0)
    assert(maxBasket <= Round10bOps.basketCap,
      s"corpus baskets reach $maxBasket > cap — the inertness pin no " +
        "longer holds; re-derive the oracle under the cap")
    val guarded = Round10bOps.capOversizedBaskets(baskets,
      Round10bOps.basketCap)
    assert(guarded eq baskets,
      "the guard rewrote the plan on an all-under-cap corpus")
    // the trim path: one basket of cap+20 items, one of 3
    val cap = 8
    val planted = ((0 until cap + 20).map(i => (1L, 100L + i)) ++
      Seq((2L, 7L), (2L, 8L), (2L, 9L))).toDF("o", "p")
    val trimmed = Round10bOps.capOversizedBaskets(planted, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sizes = trimmed.groupBy(_._1).map { case (o, xs) => o -> xs.length }
    assert(sizes == Map(1L -> cap, 2L -> 3),
      s"trim sizes $sizes — expected basket 1 at the cap, basket 2 " +
        "untouched")
    // deterministic selection: the cap items minimizing h32("bk:"+p)
    val wantKept = planted.filter(col("o") === 1L)
      .select(col("p"),
        gf.h32(concat(lit("bk:"), col("p").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (p, h) => (h, p) }.take(cap).map(_._1).toSet
    val gotKept = trimmed.filter(_._1 == 1L).map(_._2).toSet
    assert(gotKept == wantKept,
      s"trim selection diverged from bottom-cap-by-hash: kept " +
        s"${gotKept -- wantKept}, dropped ${wantKept -- gotKept}")
  }

  // ---------------------- r19 optimization pins (exemplars guard)

  test("E28 exemplars: the starved-trim guard still FIRES loudly " +
      "after the r19 restructure (sentinel rn replaces the " +
      "survivor-count window) — a corpus whose lseed hashes all land " +
      "ABOVE the non-saturated threshold asserts instead of returning " +
      "a silently short layer") {
    import graft.functions.gf
    // 100 ids whose h32("lseed:"+id) sits in the TOP 10% of the hash
    // space: n = 100 → n_ex = 20, thr = 2³²·80/100 (non-saturated),
    // and zero survivors of h < thr — the exact starvation case the
    // guard exists for. The ids are found by scanning a candidate
    // range with the production hash itself, so the plant can never
    // drift from the hash function.
    val hi = spark.range(200000)
      .select(col("id").as("vec_id"),
        gf.h32(concat(lit("lseed:"), col("id").cast("string"))).as("h"))
      .filter(col("h") >= lit((0.9 * 4294967296L).toLong))
      .orderBy(col("vec_id")).limit(100).select(col("vec_id"))
      .localCheckpoint(true)
    assert(hi.count() == 100, "candidate scan found too few high-hash ids")
    val e = intercept[Exception] {
      Round16Ops.exemplars(hi).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("starved the exact trim")),
      s"wrong failure: ${messages(e).take(3)}")
  }

  test("E28 exemplars: a healthy corpus selects the SAME set through " +
      "the r19 guard restructure as the reference global rank window") {
    val ids = synthEmbN(500).select(col("vec_id"))
    val got = Round16Ops.exemplars(ids).collect()
      .map(_.getLong(0)).toSet
    val n = 500L
    val nEx = (math.ceil(math.sqrt(n.toDouble)) * 2).toLong
    val want = ids
      .select(col("vec_id").as("nid"),
        gf.h32(concat(lit("lseed:"), col("vec_id").cast("string")))
          .as("h"))
      .orderBy(col("h"), col("nid")).limit(nEx.toInt)
      .collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"guard restructure changed the selected set: extra " +
        s"${got -- want}, missing ${want -- got}")
  }
}
