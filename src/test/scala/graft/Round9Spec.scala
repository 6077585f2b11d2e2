package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-9 operator invariants: peeling fixpoint for the k-core
  * census, quantization-ladder monotonicity for the SQ sweep, FPR
  * theory agreement for the Bloom calibration, the two-regime
  * confusion matrix for the NB audit, target-enrichment for DSIR,
  * and construction-derived churn counts for the CDC diff. */
class Round9Spec extends SparkSuite {

  test("dedup_kcore: 8 peeling rounds reach the fixpoint (round 10 identical) and every core node keeps degree >= k") {
    val pairs = DedupOps.dedupMinhashLsh(spark, sf).select("id1", "id2")
      .persist()
    try {
      for (k <- Seq(2, 3)) {
        val e8 = Round9Ops.kcorePipeline(pairs, k, 8)
        val e10 = Round9Ops.kcorePipeline(pairs, k, 10)
        // fixpoint: once a peeling round removes nothing, every later
        // round is identical — so e8 == e10 proves e8 IS the k-core
        assert(e8.exceptAll(e10).isEmpty && e10.exceptAll(e8).isEmpty,
          s"k=$k: peeling had not converged by round 8")
        // defining invariant: within the surviving subgraph every
        // endpoint has degree >= k
        val minDeg = e8.select(col("id1").as("n"))
          .unionByName(e8.select(col("id2").as("n")))
          .groupBy("n").count().agg(min("count")).collect()(0)
        if (!minDeg.isNullAt(0))
          assert(minDeg.getLong(0) >= k, s"k=$k: node with degree < $k")
      }
    } finally pairs.unpersist()
  }

  test("ann_sq_sweep: reference recall is exact and recall is monotone in quantization bits") {
    val rows = Round9Ops.annSqSweep(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> r.getAs[Long]("recall_ppm"))
      .toMap
    assert(rows("ref") == 1000000L, "reference must recall itself exactly")
    assert(rows("b8") >= rows("b4") && rows("b4") >= rows("b2"),
      s"recall not monotone in bits: $rows")
  }

  test("sketch_bloom_calibration: FPR decreases with filter size and tracks theory") {
    val rows = Round9Ops.sketchBloomCalibration(spark, sf).collect()
      .map(r => (r.getAs[Long]("m_bits"), r.getAs[Long]("fpr_ppm"),
        r.getAs[Long]("theory_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 1024L, 4096L))
    // monotone: more bits, fewer false positives
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 },
      s"FPR not decreasing in m: $rows")
    // loose Poisson-noise agreement with (1 - e^{-kn/m})^k: each side
    // within 3x + 10000 ppm of the other (1000 probes -> +-~matters
    // only at small expected counts)
    rows.foreach { case (m, fpr, th) =>
      assert(fpr <= 3 * th + 10000 && th <= 3 * fpr + 10000,
        s"m=$m measured $fpr vs theory $th ppm diverge")
    }
  }

  test("text_nb_classify: planted chrome classifies, unchromed collapses") {
    val cm = Round9Ops.textNbClassify(spark, sf).collect()
      .map(r => (r.getAs[String]("true_source"),
        r.getAs[String]("pred_source"), r.getAs[Long]("n_docs")))
    def chromed(s: String) = s.stripPrefix("src").toInt < 10
    val (c, u) = cm.partition(t => chromed(t._1))
    def acc(rows: Array[(String, String, Long)]) = {
      val tot = rows.map(_._3).sum
      val hit = rows.filter(t => t._1 == t._2).map(_._3).sum
      (hit, tot)
    }
    val (ch, ct) = acc(c)
    val (uh, ut) = acc(u)
    assert(ct > 0 && ut > 0)
    // chromed half: the planted nav/menu/footer tokens are fully
    // discriminative -> >= 90% of the holdout classifies correctly
    assert(ch * 10 >= ct * 9, s"chromed accuracy $ch/$ct below 90%")
    // unchromed half: no lexical source signal exists (measured:
    // the raw corpus draws all sources from one 31-token pool), so
    // the diagonal must stay near-empty — above 20% would mean the
    // corpus gained a real signal and the scaladoc story is stale
    assert(uh * 5 <= ut, s"unchromed accuracy $uh/$ut above 20%")
  }

  test("sample_dsir: target-like docs are enriched among keeps") {
    val rows = Round9Ops.sampleDsir(spark, sf).collect()
      .map(r => (r.getAs[String]("source") == "src0",
        r.getAs[Boolean]("keep")))
    val (tgt, rest) = rows.partition(_._1)
    val tgtRate = tgt.count(_._2).toDouble / tgt.length
    val restRate = rest.count(_._2).toDouble / rest.length
    // importance weights must rank the target feed's own docs above
    // the corpus at large — else the weight estimator is broken
    assert(tgtRate > restRate,
      s"src0 keep rate $tgtRate not above rest $restRate")
    // threshold is the 80th percentile -> overall keep fraction ~20%
    val total = rows.count(_._2).toDouble / rows.length
    assert(total > 0.1 && total < 0.35, s"keep fraction $total off 20%")
  }

  test("custom expressions execute inside WholeStageCodegen spans") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import graft.functions.gf
    // a hot-path shape: scan -> custom-expression projection -> filter
    // -> aggregate. Every plan line carrying a graft_* expression must
    // be inside a codegen stage (the '*(n)' annotation) — a custom
    // Expression that fell out of whole-stage codegen would silently
    // interpret per row at 100 TB.
    // AQE wraps stages and defers codegen collapse to execution time;
    // disabling it for the plan capture makes the WholeStageCodegen
    // structure directly inspectable (codegen itself is orthogonal)
    val old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Tables.documents(spark, sf)
        .select(col("source"), gf.simhash_md5(col("text")).as("s"),
          gf.h32(col("text")).as("h"))
        .filter(col("s") =!= 0)
        .groupBy(col("source")).agg(count(lit(1)).as("n"), max(col("h")))
      val plan = df.queryExecution.executedPlan
      val wsc = plan.collect { case w: WholeStageCodegenExec => w }
      assert(wsc.nonEmpty, s"no codegen stage in:\n$plan")
      // a codegen'd operator line carries the '*(n)' stage annotation.
      // FileScan lines echo pushed DataFilters in their metadata — an
      // expression MENTION, not an execution site — so they're excluded
      val exprLines = plan.toString.split("\n")
        .filter(_.contains("graft_")).filterNot(_.contains("FileScan"))
      assert(exprLines.nonEmpty, "expected graft_* expressions in the plan")
      assert(exprLines.forall(_.contains("*(")),
        s"custom expression outside codegen span:\n${exprLines.mkString("\n")}")
      // and the generated source actually materializes (compiles past
      // the fallback path)
      val (_, src) = wsc.head.doCodeGen()
      assert(src.body.nonEmpty)
      // the fused kernels produce rows end-to-end under that plan
      assert(df.collect().nonEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("dedup_band_sweep: candidate sets nest and recall is monotone in band count") {
    val rows = Round9Ops.dedupBandSweep(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_bands"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_verified"), r.getAs[Long]("recall_ppm")))
      .sortBy(-_._1)
    assert(rows.map(_._1).toSeq == Seq(32L, 16L, 8L))
    // nesting: a matching longer band implies its sub-bands match, so
    // fewer/longer bands can only LOSE candidates and verified pairs
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 >= b._3 })
    assert(rows.head._4 == 1000000L, "most permissive config defines recall")
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 >= b._4 })
  }

  test("q_mann_whitney: U_A + U_B == 2 * n_A * n_B and z is finite") {
    val r = Round9Ops.qMannWhitney(spark, sf).collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(r.getAs[Long]("u2_a") + r.getAs[Long]("u2_b") == 2 * na * nb)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("mm_byte_entropy: ASCII payloads read low-entropy with bounded nibble support") {
    val rows = MultimodalOps.mmByteEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    // printable-ASCII high nibbles live in {2..7} -> at most 6 buckets,
    // entropy far below the compressed-media band
    rows.foreach { r =>
      assert(r.getAs[Long]("distinct_nibbles") <= 6)
      assert(r.getAs[String]("entropy_class") == "low")
    }
  }

  test("q_survival_km: survival is monotone non-increasing and the risk set telescopes") {
    val rows = Round9Ops.qSurvivalKm(spark, sf).collect()
      .map(r => (r.getAs[Long]("gap_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), r.getAs[Long]("c"),
        r.getAs[Double]("survival")))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.head._5 <= 1.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5 + 1e-9, s"survival increased: $a -> $b")
      // the next day's risk set is exactly this day's minus its exits
      assert(b._2 == a._2 - a._3 - a._4, s"risk set broke: $a -> $b")
    case _ => ()
    }
  }

  test("text_rake: phrases capped at 4 words with positive scores") {
    val rows = Round9Ops.textRake(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") <= 4)
      assert(r.getAs[Long]("score_micro") > 0)
      assert(r.getAs[String]("phrase").split(" ").length
        == r.getAs[Long]("n_words"))
    }
  }

  test("dedup_cluster_stability: tightening the threshold refines the clustering") {
    val r = Round9Ops.dedupClusterStability(spark, sf).collect()(0)
    // same cluster under 0.6 implies connected via >=0.6 edges, all of
    // which exist at 0.5 -> same cluster under 0.5. A violation means
    // the closures disagree on shared edges.
    assert(r.getAs[Long]("pairs_only_tight") == 0L)
    assert(r.getAs[Long]("agreement_ppm") <= 1000000L)
    assert(r.getAs[Long]("n_pairs_eval") >=
      r.getAs[Long]("same_both") + r.getAs[Long]("pairs_only_loose"))
  }

  test("etl_cdc_diff: churn counts derive from the snapshot construction") {
    val o = Tables.orders(spark, sf)
    val n3 = o.filter(col("o_orderkey") % 10 === 3).count()  // inserts
    val n7 = o.filter(col("o_orderkey") % 10 === 7).count()  // deletes
    val nU = o.filter(col("o_orderkey") % 5 === 0
      && col("o_orderkey") % 10 =!= 3
      && col("o_orderkey") % 10 =!= 7).count()               // updates
    val got = Round9Ops.etlCdcDiff(spark, sf).groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("I", 0L) == n3, s"I: $got vs $n3")
    assert(got.getOrElse("D", 0L) == n7, s"D: $got vs $n7")
    assert(got.getOrElse("U", 0L) == nU, s"U: $got vs $nU")
  }
}
