package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, StatsOps, TextOps, WarehouseOps}

/** Property tests for the late-round-8 curation/audit operators:
  * boilerplate segment removal (C20), the kNN graph (E19), SemDeDup
  * (E20), the dimension-ablation sweep (E21), chi-square independence
  * (B70), the Benford audit (B71), and the compaction planner (A27).
  * Each test checks an invariant derivable from an INDEPENDENT ground
  * truth (table counts, planted signals, self-consistency identities)
  * rather than replaying the operator's own arithmetic. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("C20: footer segment is dropped from every doc; clean docs keep exactly their original text") {
    val out = TextOps.textSegDedup(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    assert(out.length == docs.size)
    out.foreach { r =>
      val (nSeg, nDropped, nKept) =
        (r.getAs[Long]("n_seg"), r.getAs[Long]("n_dropped"), r.getAs[Long]("n_kept"))
      assert(nDropped + nKept == nSeg, s"doc ${r.get(0)}: kept+dropped != segments")
      assert(nDropped >= 1, s"doc ${r.get(0)}: injected footer not dropped")
      // docs whose ONLY dropped segment is the aligned footer reassemble
      // to exactly their original text (same tokens, single spaces)
      if (nDropped == 1)
        assert(r.getAs[Long]("cleaned_len") == docs(r.getAs[Long]("doc_id")),
          s"doc ${r.get(0)}: cleaned_len != original n_chars")
    }
  }

  test("E19: knn_graph ranks are consecutive per node and sims are bounded by the exact top-1") {
    val g = AnnOps.knnGraph(spark, sf).collect()
    assert(g.nonEmpty)
    val bySrc = g.groupBy(_.getAs[Long]("src"))
    bySrc.foreach { case (src, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to rows.length), s"node $src ranks not consecutive")
      assert(rows.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-9))
    }
    // LSH buckets at 4x8 bits leave the overwhelming majority of nodes
    // with at least one candidate on this corpus
    val n = Tables.embeddings(spark, sf).count()
    assert(bySrc.size >= (n * 0.9).toLong, s"only ${bySrc.size} of $n nodes have neighbors")
  }

  test("E20: every planted exact duplicate is dropped, every original of a pair survives") {
    val out = AnnOps.embSemdedup(spark, sf).collect()
    val kept = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("kept")).toMap
    val planted = kept.keys.filter(_ >= 100000L)
    assert(planted.nonEmpty)
    planted.foreach { c =>
      assert(kept(c) == "N", s"planted copy $c not dropped")
      assert(kept(c - 100000L) == "Y", s"original ${c - 100000L} wrongly dropped")
    }
  }

  test("E22: semdedup sweep is monotone in tau and pins planted dups at tau=1.0") {
    val rows = operators.AnnOps.embSemdedupSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("tau_bp"))
    assert(rows.map(_.getAs[Int]("tau_bp")).toSeq ==
      Seq(9500, 9800, 9900, 9950, 10000))
    val nPlanted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0).count()
    // raising tau can only shrink the edge set and the dropped set
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("n_edges") <= lo.getAs[Long]("n_edges"))
      assert(hi.getAs[Long]("n_dropped") <= lo.getAs[Long]("n_dropped"))
      assert(hi.getAs[Long]("keep_ppm") >= lo.getAs[Long]("keep_ppm"))
    }
    // at tau=1.0 only exact duplicates survive the threshold; every
    // planted copy has a sim-1.0 partner with a lower id
    val strict = rows.last
    assert(strict.getAs[Long]("n_dropped") == nPlanted,
      s"tau=1.0 dropped ${strict.getAs[Long]("n_dropped")}, planted $nPlanted")
  }

  test("E21: ablation recall is 100% at full dim, bounded and non-degenerate below") {
    val rows = AnnOps.embDimAblation(spark, sf).collect()
      .map(r => r.getAs[Int]("d") ->
        (r.getAs[Long]("hits"), r.getAs[Long]("n_top"), r.getAs[Long]("recall_ppm")))
      .toMap
    assert(rows.keySet == Set(8, 16, 32, 64))
    rows.values.foreach { case (hits, nTop, ppm) =>
      assert(nTop == 100L) // 20 queries x top-5
      assert(hits >= 0 && hits <= nTop && ppm >= 0 && ppm <= 1000000L)
    }
    assert(rows(64)._3 == 1000000L, "full-dim recall vs itself must be exact")
    assert(rows(8)._3 <= rows(64)._3)
  }

  test("B70: chi-square cells conserve the orders table; dof matches the category grid") {
    val out = StatsOps.qChisqIndependence(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum == nOrders)
    val nPrio = out.map(_.getAs[String]("prio")).distinct.length
    val nStatus = out.map(_.getAs[String]("status")).distinct.length
    out.foreach { r =>
      assert(r.getAs[Long]("dof") == (nPrio - 1).toLong * (nStatus - 1))
      assert(r.getAs[Long]("chisq_contrib_e6") >= 0L)
    }
  }

  test("B71: Benford digits partition the lineitem table and expected shares sum to one") {
    val out = StatsOps.qBenford(spark, sf).collect()
    assert(out.map(_.getAs[Int]("digit")).sorted.toSeq == (1 to 9))
    assert(out.map(_.getAs[Long]("n")).sum == Tables.lineitem(spark, sf).count())
    assert(out.map(_.getAs[Long]("expected_ppm")).sum == 1000000L)
    val obs = out.map(_.getAs[Long]("observed_ppm")).sum
    assert(obs > 1000000L - 9 && obs <= 1000000L, s"observed ppm sum $obs")
  }

  test("I11: q-digest quantile estimates cover their target ranks within the straddle bound") {
    val out = operators.SketchOps.sketchQdigest(spark, sf).collect()
      .sortBy(_.getAs[Int]("p"))
    assert(out.map(_.getAs[Int]("p")).toSeq == Seq(1, 5, 25, 50, 75, 95, 99))
    val t = out.head.getAs[Long]("t")
    val nNodes = out.head.getAs[Long]("n_nodes")
    assert(nNodes <= 1024L + 21L, s"digest holds $nNodes nodes")
    val cents = Tables.lineitem(spark, sf)
      .select(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("v"))
      .as[Long].collect().sorted
    // the heaviest 16-cent leaf bucket can emit at level 0 with its
    // full mass, so the one-sided overshoot bound carries it
    val maxBucket = cents.groupBy(_ / 16).values.map(_.length).max
    val bound = 2L * t * 20L + maxBucket
    var prev = Long.MinValue
    out.foreach { r =>
      val est = r.getAs[Long]("est_cents")
      val target = r.getAs[Long]("target_rank")
      val exactRank = cents.count(_ <= est).toLong
      assert(exactRank >= target,
        s"p=${r.get(0)}: digest under-covers (rank $exactRank < target $target)")
      assert(exactRank - target <= bound,
        s"p=${r.get(0)}: overshoot ${exactRank - target} exceeds bound $bound")
      assert(est >= prev, "estimates must be nondecreasing in p")
      prev = est
    }
  }

  test("I11: q-digest is a pure multiset function — merged partials compress to the direct digest") {
    import org.apache.spark.sql.functions.{count => cnt}
    // adversarial distributions the lineitem corpus doesn't exercise:
    // heavy point mass, geometric tail, and a dense uniform block
    val vals: Seq[Long] =
      Seq.fill(5000)(42L) ++ (0 until 4000).map(i => (1L << (i % 20)) + i % 7) ++
        (0 until 3000).map(i => 500000L + i)
    val df = spark.createDataset(vals)(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("v").select(expr("v div 16").as("id"))
    val whole = df.groupBy($"id").agg(cnt(lit(1)).as("c"))
    // two disjoint "partial digests" merged by leaf-count addition —
    // the distribution step a 1000-executor build performs
    val half1 = df.filter($"id" % 2 === 0).groupBy($"id").agg(cnt(lit(1)).as("c"))
    val half2 = df.filter($"id" % 2 =!= 0).groupBy($"id").agg(cnt(lit(1)).as("c"))
    val merged = half1.unionByName(half2)
      .groupBy($"id").agg(sum($"c").as("c"))
    val a = operators.SketchOps.qdigestFromLeaves(whole).collect()
      .map(_.toString).sorted.toSeq
    val b = operators.SketchOps.qdigestFromLeaves(merged).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b, "merged-partial digest diverged from direct digest")
  }

  test("D20: cluster-size profile partitions the dedup corpus exactly") {
    val out = operators.ClusterOps.dedupClusterProfile(spark, sf).collect()
    val corpusN = operators.DedupOps.corpus(Tables.documents(spark, sf)).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == corpusN,
      "size histogram must partition the corpus")
    out.foreach { r =>
      val (k, nc, nd, ex) = (r.getAs[Long]("k"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("dup_excess"))
      assert(nd == k * nc && ex == (k - 1) * nc)
    }
    // the planted near-dups guarantee at least one multi-doc cluster
    assert(out.exists(r => r.getAs[Long]("k") > 1 && r.getAs[Long]("n_clusters") > 0))
  }

  test("A27: compaction bins conserve bytes and files per source; fills are near target") {
    val out = WarehouseOps.etlCompactionPlan(spark, sf).collect()
    val truth = Tables.documents(spark, sf).groupBy($"source")
      .agg(count(lit(1)).as("nf"), sum($"n_chars").as("b"))
      .as[(String, Long, Long)].collect()
      .map { case (s, nf, b) => s -> (nf, b) }.toMap
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc.keySet == truth.keySet)
    bySrc.foreach { case (src, bins) =>
      val (nf, b) = truth(src)
      assert(bins.map(_.getAs[Long]("n_files")).sum == nf)
      assert(bins.map(_.getAs[Long]("bin_bytes")).sum == b)
      val ids = bins.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq,
        s"$src bins not contiguous: ${ids.toSeq}")
      // next-fit bound: a bin overfills by at most one file
      bins.foreach { r =>
        assert(r.getAs[Long]("bin_bytes") <= 4096L + 600L,
          s"$src bin ${r.getAs[Long]("bin_id")} exceeds target + max file size")
      }
    }
  }
}
