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
}
