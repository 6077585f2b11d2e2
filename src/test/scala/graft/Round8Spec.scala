package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.streaming.StreamingTwins

/** Round-8 operator properties: hand-computed oracles on crafted
  * corpora (C15/D14), law/shape checks on the real test tables
  * (J10/J11/F5/A22/E11), and cross-twin consistency (G11 vs G2,
  * G12 vs the batch split). */
class Round8Spec extends SparkSuite {
  import spark.implicits._

  /** Tiny documents table with known gram structure: doc 4 duplicates
    * doc 1 verbatim (span coverage 1.0 for both). */
  private lazy val tinyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_r8docs").toString
    Seq(
      (1L, "a b c a b c a b c", "en", "s1", 17L),
      (2L, "x y z w v u t s", "en", "s1", 15L),
      (3L, "p p p p p p p p", "en", "s2", 15L),
      (4L, "a b c a b c a b c", "en", "s2", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("text_repetition: hand-computed gram ratios on a crafted corpus") {
    val rows = TextOps.textRepetition(spark, tinyDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n3"), r.getAs[Double]("rep3"),
          r.getAs[Double]("top2_frac")))).toMap
    // doc 1: 9 tokens → 7 trigrams, 3 distinct → rep3 = 1 − 3/7;
    // 8 bigrams: "a b"×3, "b c"×3, "c a"×2 → top share 3/8
    assert(rows(1L)._1 == 7)
    assert(math.abs(rows(1L)._2 - (1.0 - 3.0 / 7.0)) < 1e-5)
    assert(math.abs(rows(1L)._3 - 0.375) < 1e-9)
    // doc 2: all tokens distinct → rep3 = 0, top bigram share 1/7
    assert(rows(2L)._2 == 0.0)
    assert(math.abs(rows(2L)._3 - 1.0 / 7.0) < 1e-5)
    // doc 3: one repeated token → 6 identical trigrams, all bigrams equal
    assert(math.abs(rows(3L)._2 - (1.0 - 1.0 / 6.0)) < 1e-5)
    assert(rows(3L)._3 == 1.0)
  }

  test("dedup_span_coverage: verbatim duplicate pair has full coverage, others zero") {
    val rows = DedupMore.dedupSpanCoverage(spark, tinyDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("span_frac")).toMap
    assert(rows(1L) == 1.0 && rows(4L) == 1.0)
    assert(rows(2L) == 0.0 && rows(3L) == 0.0)
  }

  test("sample_temperature: rates follow the inverse-sqrt law and cap at 1") {
    val rows = PipelineOps.sampleTemperature(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_source"), r.getAs[Double]("rate"),
        r.getAs[Long]("n_kept")))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, r, _) => r > 0.0 && r <= 1.0 })
    // α = 0.5 ⇒ keep rate decreases with source size (up-samples the tail)
    val bySize = rows.sortBy(_._1)
    bySize.zip(bySize.tail).foreach { case ((n1, r1, _), (n2, r2, _)) =>
      if (n1 < n2) assert(r1 >= r2 - 1e-9, s"rate not monotone: $n1:$r1 vs $n2:$r2")
    }
    // the deterministic draw lands near rate·n (loose bound, tiny sources)
    rows.foreach { case (n, r, k) =>
      assert(math.abs(k - r * n) <= math.max(10.0, 0.5 * r * n + 5)) }
  }

  test("corpus_report: partitions the corpus, metrics in range") {
    val rows = PipelineOps.corpusReport(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val q = r.getAs[Double]("mean_quality")
      val d = r.getAs[Double]("dup_rate")
      assert(q > 0.0 && q <= 1.0, s"quality $q")
      assert(d >= 0.0 && d <= 1.0, s"dup_rate $d")
    }
  }

  test("mm_modality_mix: partitions every document into a known modality") {
    val rows = MultimodalOps.mmModalityMix(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum ==
      Tables.documents(spark, sf).count())
    assert(rows.forall(r =>
      Set("image", "audio", "video").contains(r.getAs[String]("modality"))))
  }

  test("etl_type_infer: keys BIGINT, price DOUBLE, text VARCHAR") {
    val rec = EtlOps.etlTypeInfer(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("recommended"))
      .toMap
    assert(rec("o_orderkey") == "BIGINT")
    assert(rec("o_custkey") == "BIGINT")
    assert(rec("o_totalprice") == "DOUBLE")
    assert(rec("o_orderstatus") == "VARCHAR")
    assert(rec("o_orderpriority") == "VARCHAR")
  }

  test("emb_incremental_encode: full code set per new vector, one cell each") {
    val rows = AnnOps.embIncrementalEncode(spark, sf).collect()
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.nonEmpty)
    byVec.foreach { case (v, rs) =>
      assert(rs.map(_.getAs[Int]("j")).toSet == (0 until 8).toSet,
        s"vec $v missing subspace codes")
      assert(rs.forall { r => val c = r.getAs[Int]("c"); c >= 0 && c < 16 })
      assert(rs.map(_.getAs[Number]("cell").longValue).toSet.size == 1)
    }
  }

  test("session_window twin agrees with the flatMapGroupsWithState twin") {
    // G2's state tracks epoch MILLIS (its starts are ms-floored);
    // session_window keeps the full µs timestamp — compare at ms grain
    def msFloor(t: java.time.LocalDateTime): java.time.LocalDateTime =
      t.truncatedTo(java.time.temporal.ChronoUnit.MILLIS)
    val g2 = StreamingTwins.streamingSessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        msFloor(r.getAs[java.time.LocalDateTime]("session_start")),
        r.getAs[Long]("n_events"))).toSet
    val g11 = StreamingTwins.streamingSessionWindow(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        msFloor(r.getAs[java.time.LocalDateTime]("session_start")),
        r.getAs[Long]("n_events"))).toSet
    // identical (user, start, size) triples unless the data carries an
    // exact-30-min gap (the one documented boundary difference)
    assert(g11 == g2,
      s"missing=${(g2 -- g11).take(3)} extra=${(g11 -- g2).take(3)}")
    assert(g11.nonEmpty)
  }

  test("streaming band probe emits only new×old pairs at est ≥ 0.5") {
    val flags = DedupOps.corpus(Tables.documents(spark, sf))
      .select($"doc_id",
        (graft.functions.gf.h32($"doc_id".cast("string")) % 10 === 0).as("n"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val rows = StreamingTwins.streamingBandProbe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(flags(r.getAs[Long]("id_new")), "id_new not in the new split")
      assert(!flags(r.getAs[Long]("id_old")), "id_old not in the standing corpus")
      assert(r.getAs[Double]("est_jaccard") >= 0.5)
    }
  }

  test("sample_group_split: groups never straddle splits, ratios near 80/10/10") {
    val rows = PipelineOps.sampleGroupSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    // split purity: one split value per group key
    val perGroup = rows.groupBy(_.getAs[String]("gkey"))
    perGroup.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("split")).distinct.length == 1)
      assert(rs.map(_.getAs[Long]("group_size")).distinct.sameElements(
        Array(rs.length.toLong)))
    }
    // ratio at the GROUP level (the draw's granularity): loose bounds
    val splits = perGroup.map(_._2.head.getAs[String]("split")).toSeq
    val train = splits.count(_ == "train").toDouble / splits.size
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
  }

  test("ann_filtered: label-constrained top-5 agrees with a per-label brute force") {
    val emb = Tables.embeddings(spark, sf)
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = AnnOps.annFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      // every neighbor carries the query's label; filtered ranks are
      // dense 1..k; global rank is always ≥ the filtered rank
      rs.foreach { r =>
        assert(labels(r.getAs[Long]("nid")) == labels(qid))
        assert(r.getAs[Long]("global_rank") >= r.getAs[Long]("rank"))
      }
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rs.length).toSeq)
      // post-filter survival is exactly "global rank within 20"
      rs.foreach { r =>
        assert((r.getAs[Long]("survives_postfilter") == 1L) ==
          (r.getAs[Long]("global_rank") <= 20L))
      }
    }
    // the trade is real on this corpus: some true neighbor must fall
    // outside the global top-20 (otherwise the query probes nothing)
    assert(rows.exists(_.getAs[Long]("survives_postfilter") == 0L))
  }

  test("ann_mmr: 5 picks per query from the top-12 pool, iter 1 = top-1, diversification real") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = AnnOps.bruteForceTopK(emb, qs, 12).collect()
    def ranked(k: Int) = top.filter(_.getAs[Int]("rank") <= k)
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nid")).toSet }
    val (top12, top5) = (ranked(12), ranked(5))
    val top1 = top.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    val rows = AnnOps.annMmr(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      val nids = rs.map(_.getAs[Long]("nid"))
      assert(nids.distinct.length == 5, "no repeat selections")
      assert(nids.forall(top12(q).contains), "picks come from the pool")
      // first pick is pure relevance
      assert(rs.find(_.getAs[Long]("iter") == 1L).get
        .getAs[Long]("nid") == top1(q))
    }
    // λ < 1 must actually trade relevance for coverage somewhere
    assert(byQ.exists { case (q, rs) =>
      rs.map(_.getAs[Long]("nid")).toSet != top5(q)
    }, "MMR never diverged from plain top-5 — diversity term inert")
  }

  test("text_zipf: slope negative, R² in (0,1], totals consistent per source") {
    val rows = TextOps.textZipf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        s"natural-language feed must have a falling rank-frequency curve: $r")
      val r2 = r.getAs[Double]("zipf_r2")
      assert(r2 > 0.0 && r2 <= 1.0)
      assert(r.getAs[Long]("total_tokens") >= r.getAs[Long]("distinct_tokens"))
      assert(r.getAs[Long]("n_top") <= 50L)
    }
  }

  test("etl_schema_drift: locale flip caught as type drift, unique keys gated") {
    val rows = EtlOps.etlSchemaDrift(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 4)
    // the injected comma-decimal flip: DOUBLE early, VARCHAR late
    val tp = rows("o_totalprice")
    assert(tp.getAs[Long]("type_drift") == 1L)
    assert(tp.getAs[String]("rec_early") == "DOUBLE")
    assert(tp.getAs[String]("rec_late") == "VARCHAR")
    // every other column parses to the same type in both halves
    Seq("o_orderkey", "o_orderstatus", "o_orderpriority").foreach { c =>
      assert(rows(c).getAs[Long]("type_drift") == 0L)
      assert(rows(c).getAs[String]("rec_early")
        == rows(c).getAs[String]("rec_late"))
    }
    // the dominance gate: a unique-key column's "top value" changes
    // between any two batches, but at share ≈ 1/n it must NOT fire
    assert(rows("o_orderkey").getAs[Long]("domain_drift") == 0L)
    // stable categorical domains stay quiet too
    assert(rows("o_orderstatus").getAs[Long]("domain_drift") == 0L)
  }

  test("q_seasonality: cells partition the feed, lifts positive and centered") {
    val ev = Tables.events(spark, sf).count()
    val rows = StatsOps.qSeasonality(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("c")).sum == ev)
    rows.foreach { r =>
      val d = r.getAs[Long]("dow")
      assert(d >= 0L && d <= 6L)
      assert(r.getAs[Double]("seasonal_lift") > 0.0)
    }
    // per type, the count-weighted mean lift is 1 by construction
    // (Σ_dow (c/tt)·lift = Σ c²/(tt·dt/gt)... not identically 1), but
    // the UNWEIGHTED lift must straddle 1: some cell ≥ 1, some ≤ 1
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val lifts = rs.map(_.getAs[Double]("seasonal_lift"))
      assert(lifts.max >= 1.0 - 1e-6 && lifts.min <= 1.0 + 1e-6)
    }
  }
}
