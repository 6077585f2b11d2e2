package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnOps, DedupOps}

class DedupSpec extends SparkSuite {

  private def plantedExact = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 === 0)
    .select(col("doc_id"), (col("doc_id") + DedupOps.ExactCopyOffset).as("copy_id"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup finds every planted duplicate group, canonical = original") {
    val out = DedupOps.dedupExact(spark, sf).collect()
    val planted = plantedExact
    assert(out.length == planted.size)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2)
      val ids = r.getAs[String]("doc_ids").split(",").map(_.toLong)
      assert(r.getAs[Long]("canonical_doc_id") == ids.min)
    }
  }

  test("minhash LSH recalls all exact pairs at est_jaccard 1.0 and all near pairs") {
    val pairs = DedupOps.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("est_jaccard")))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    plantedExact.foreach { case (a, b) =>
      assert(byPair.get((a, b)).contains(1.0), s"missing exact pair ($a,$b)")
    }
    // near-dup copies (one appended token) must be recalled with high estimate
    val near = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 5)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val nearFound = near.count(d => byPair.contains((d, d + DedupOps.NearCopyOffset)))
    assert(nearFound >= (near.length * 0.9).toInt, s"near recall $nearFound/${near.length}")
  }

  test("simhash recalls exact pairs at hamming 0; all reported pairs <= 3") {
    val pairs = DedupOps.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Int]("hamming")))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    plantedExact.foreach { case (a, b) =>
      assert(byPair.get((a, b)).contains(0), s"missing exact pair ($a,$b)")
    }
    assert(pairs.forall(_._3 <= 3))
  }

  test("ngram jaccard: exact pairs = 1.0, near pairs high, values in (0,1]") {
    val pairs = DedupOps.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("jaccard")))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    plantedExact.foreach { case (a, b) =>
      assert(byPair.get((a, b)).contains(1.0), s"missing exact pair ($a,$b)")
    }
    assert(pairs.forall(p => p._3 > 0 && p._3 <= 1.0))
  }

  test("embedding dedup finds exactly the planted vector copies at sim 1.0") {
    val out = DedupOps.dedupEmbedding(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("sim")))
    val planted = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0)
      .select(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + DedupOps.ExactCopyOffset)).toSet
    assert(out.map(p => (p._1, p._2)).toSet == planted)
    assert(out.forall(_._3 == 1.0))
  }
}

class AnnSpec extends SparkSuite {

  private def truth: Map[Long, Seq[Long]] =
    AnnOps.annBruteforce(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("nid")).toSeq
      }

  test("brute force: 5 ranked neighbors per query, sims descending, no self") {
    val rows = AnnOps.annBruteforce(spark, sf).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(!sorted.map(_.getAs[Long]("nid")).contains(q))
    }
  }

  test("LSH ANN: recall@5 vs brute force is nontrivial on random vectors") {
    val t = truth
    val got = AnnOps.annLsh(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nid")).toSet }
    val recalls = t.map { case (q, nids) =>
      nids.count(got.getOrElse(q, Set.empty).contains).toDouble / nids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@5 = $mean")
  }

  test("LSH ANN: planted identical vector is always retrieved as top hit") {
    import graft.functions.gf
    val emb = Tables.embeddings(spark, sf)
    val corpus = DedupOps.embeddingCorpus(emb)
    // only every 10th vector has a planted copy in the corpus
    val queries = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val out = AnnOps.lshTopK(corpus, queries, 1).collect()
    out.foreach { r =>
      // top hit for query q must be its planted copy q+100000 at sim 1.0
      assert(r.getAs[Long]("nid") == r.getAs[Long]("qid") + DedupOps.ExactCopyOffset)
      assert(r.getAs[Double]("sim") == 1.0)
    }
    assert(out.length == 10)
  }

  test("IVF ANN: recall@5 vs brute force with nprobe=3 of 10 cells") {
    val t = truth
    val got = AnnOps.annIvf(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nid")).toSet }
    val recalls = t.map { case (q, nids) =>
      nids.count(got.getOrElse(q, Set.empty).contains).toDouble / nids.size
    }
    val mean = recalls.sum / recalls.size
    // random vectors, 3/10 cells probed → expect ≈0.3 of neighbors found
    assert(mean >= 0.15, s"mean recall@5 = $mean")
  }

  test("IVFPQ sweep: full grid, recall in [0,1], monotone along the width axis") {
    val rows = AnnOps.annIvfPqSweep(spark, sf).collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("width"),
        r.getAs[Double]("recall")))
    assert(rows.length == 12, rows.mkString(","))
    assert(rows.forall { case (_, _, r) => r >= 0.0 && r <= 1.0 })
    // width-axis monotonicity is structural: top-10 ⊆ top-25 ⊆ top-50
    // of the SAME per-(nprobe,query) ADC ranking, and recall counts
    // hits against a fixed exact top-5 — widening the cut can only add
    // hits. (The nprobe axis is deliberately NOT asserted: a wider
    // probed pool can push true hits out of a tight ADC cut.)
    rows.groupBy(_._1).foreach { case (np, gs) =>
      val byWidth = gs.sortBy(_._2).map(_._3)
      assert(byWidth.zip(byWidth.tail).forall { case (a, b) => b >= a },
        s"nprobe=$np recalls not monotone in width: ${byWidth.mkString(",")}")
    }
    // the widest setting beats the tightest
    val r11 = rows.find(r => r._1 == 1 && r._2 == 10).get._3
    val r45 = rows.find(r => r._1 == 4 && r._2 == 50).get._3
    assert(r45 >= r11, s"grid corners inverted: $r45 < $r11")
  }

  test("residual IVFPQ sweep: full grid, recall in [0,1], monotone along the width axis") {
    val rows = AnnOps.annResidualSweep(spark, sf).collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("width"),
        r.getAs[Double]("recall")))
    assert(rows.length == 12, rows.mkString(","))
    assert(rows.forall { case (_, _, r) => r >= 0.0 && r <= 1.0 })
    rows.groupBy(_._1).foreach { case (np, gs) =>
      val byWidth = gs.sortBy(_._2).map(_._3)
      assert(byWidth.zip(byWidth.tail).forall { case (a, b) => b >= a },
        s"nprobe=$np recalls not monotone in width: ${byWidth.mkString(",")}")
    }
  }
}
