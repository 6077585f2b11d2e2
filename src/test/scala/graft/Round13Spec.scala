package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Round13Ops

/** Round-13 specs: the model-evaluation leg (B93/B94) — a perfectly
  * separable plant must score AUC = 10⁶ exactly (the trained model
  * recovers the separating threshold and the exact fixed-point leaf
  * values collapse to {0, 10⁶}), the emitted ROC curve must be
  * internally consistent (monotone, endpoint (P, N), and its own
  * trapezoid re-integration must reproduce auc_ppm in BigInt), and
  * the forest evaluation must score every row — including rows
  * out-of-bag for some trees. */
class Round13Spec extends SparkSuite {

  private def rocRows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("threshold", "tp", "fp", "auc_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(-_._1)

  /** Exact trapezoid AUC from a descending-threshold (tp, fp) walk —
    * the independent re-integration (BigInt, no doubles). */
  private def reAuc(curve: Seq[(Long, Long)]): Long = {
    val p = curve.last._1
    val n = curve.last._2
    if (p == 0 || n == 0) return 0L
    val walk = (0L, 0L) +: curve
    val num = walk.sliding(2).map { case Seq((tp0, fp0), (tp, fp)) =>
      BigInt(tp + tp0) * BigInt(fp - fp0)
    }.sum
    (num * 1000000 / (BigInt(2) * BigInt(p) * BigInt(n))).toLong
  }

  test("q_gbt_eval: a separable plant scores AUC exactly 10^6 with exact {0, 10^6} scores") {
    import spark.implicits._
    // y = 1 iff q <= 10; dd varies (so every boosting round has a
    // non-degenerate split domain) but carries no signal
    val rows = (1 to 120).map { i =>
      val q = (i % 20 + 1).toLong
      (q, (i % 7).toLong, if (q <= 10) 1L else 0L)
    }.toDF("q", "dd", "y")
    val out = rocRows(Round13Ops.gbtEvalPipeline(rows))
    assert(out.forall(_._4 == 1000000L),
      s"separable plant must give AUC = 10^6, got ${out.map(_._4).head}")
    // the positive class occupies the top of the score ordering: the
    // first curve point already has tp = P, fp = 0
    val p = rows.filter($"y" === 1).count()
    val n = rows.count() - p
    assert(out.head._2 == p && out.head._3 == 0,
      "all positives must outrank all negatives")
    assert(out.last._2 == p && out.last._3 == n,
      "the curve must end at (P, N)")
  }

  test("q_gbt_eval: corpus curve is monotone, ends at (P, N), and re-integrates to its own auc_ppm") {
    val out = rocRows(Round13Ops.qGbtEval(spark, sf))
    assert(out.nonEmpty)
    // one auc value on every row
    assert(out.map(_._4).distinct.size == 1)
    // monotone walk in threshold-descending order
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3, "tp/fp must be non-decreasing")
    }
    // endpoint = class totals from the corpus
    val base = Tables.lineitem(spark, sf)
      .agg(sum((col("l_returnflag") === "R").cast("long")),
        count(lit(1))).first()
    val p = base.getLong(0)
    val n = base.getLong(1) - p
    assert(out.last._2 == p && out.last._3 == n)
    // BigInt re-integration of the emitted curve reproduces auc_ppm
    assert(reAuc(out.map(t => (t._2, t._3))) == out.head._4,
      "trapezoid re-integration diverged from the emitted auc_ppm")
  }

  test("q_forest_eval: a separable plant scores AUC exactly 10^6; every row is scored (out-of-bag rows included)") {
    import spark.implicits._
    val rows = (1 to 160).map { i =>
      val q = (i % 16 + 1).toLong
      (q, (i % 5).toLong, if (q <= 8) 1L else 0L, s"r$i")
    }.toDF("q", "dd", "y", "rid")
    val out = rocRows(Round13Ops.forestEvalPipeline(spark, rows))
    assert(out.forall(_._4 == 1000000L),
      s"separable plant must give AUC = 10^6, got ${out.map(_._4).head}")
    // every one of the 160 rows lands in the curve's endpoint counts —
    // including rows that are out-of-bag for one or more trees (25%
    // per tree, so virtually surely some row is OOB somewhere)
    assert(out.last._2 + out.last._3 == 160L,
      "every row must be scored exactly once")
  }

  test("q_forest_eval: corpus curve is monotone, ends at (P, N), and re-integrates to its own auc_ppm; the forest outranks chance") {
    val out = rocRows(Round13Ops.qForestEval(spark, sf))
    assert(out.nonEmpty)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3, "tp/fp must be non-decreasing")
    }
    val base = Tables.lineitem(spark, sf)
      .agg(sum((col("l_returnflag") === "R").cast("long")),
        count(lit(1))).first()
    val p = base.getLong(0)
    val n = base.getLong(1) - p
    assert(out.last._2 == p && out.last._3 == n)
    assert(reAuc(out.map(t => (t._2, t._3))) == out.head._4,
      "trapezoid re-integration diverged from the emitted auc_ppm")
    // the trained forest must beat a coin on its own training corpus
    assert(out.head._4 > 500000L, "forest failed to outrank chance")
  }

  test("q_pr_curve: a perfect ranker has AP = 10^6 and precision 10^6 until recall 1; the final point is (recall 1, precision P/(P+N))") {
    import spark.implicits._
    import graft.operators.Round13Ops
    // scores separate perfectly: positives all outrank negatives
    val rows = (1 to 100).map { i =>
      val y = if (i <= 40) 1L else 0L
      (if (y == 1) 100L + i else i.toLong, y)
    }.toDF("s", "y")
    val out = Round13Ops.prPipeline(rows)
      .select("tp", "fp", "prec_ppm", "recall_ppm", "ap_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.forall(_._5 == 1000000L), "perfect ranker must have AP = 10^6")
    // every all-positive prefix has precision 10^6
    out.filter(_._2 == 0).foreach(r => assert(r._3 == 1000000L))
    val last = out.maxBy(r => r._1 + r._2)
    assert(last._4 == 1000000L, "the curve must reach recall 1")
    assert(last._3 == 40L * 1000000L / 100L, "final precision must be P/(P+N)")
  }

  test("q_pr_curve: corpus recall is non-decreasing with descending threshold and AP is a precision-weighted mean of recall steps") {
    import graft.operators.Round13Ops
    val out = Round13Ops.qPrCurve(spark, sf)
      .select("threshold", "tp", "fp", "prec_ppm", "recall_ppm", "ap_ppm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(-_._1)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 <= b._5, "recall must be non-decreasing")
    }
    // re-derive AP from the emitted curve (the same integer identity)
    val p = out.last._2
    val walk = (0L +: out.map(_._2)).zip(out.map(t => (t._2, t._4)))
    val ap = walk.map { case (tp0, (tp, prec)) =>
      BigInt(tp - tp0) * BigInt(prec) }.sum / BigInt(p)
    assert(ap.toLong == out.head._6,
      "AP re-derivation diverged from the emitted ap_ppm")
  }

  test("q_calibration: corpus bins conserve mass and the gap identity holds on every row") {
    import graft.operators.Round13Ops
    val out = Round13Ops.qCalibration(spark, sf)
      .select("score_ppm", "n", "observed_ppm", "gap_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // mass conservation: bin counts sum to the corpus
    assert(out.map(_._2).sum == Tables.lineitem(spark, sf).count())
    // the gap identity holds on every emitted row
    out.foreach(r => assert(r._4 == r._1 - r._3))
  }

  test("sample_holdout_eval: exactly train+test rows; the split is deterministic and ~20% test; a separable relation generalizes perfectly") {
    import graft.operators.Round13Ops
    val out = Round13Ops.sampleHoldoutEval(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("train", "test"))
    val (trainN, testN) =
      (out("train")._1 + out("train")._2, out("test")._1 + out("test")._2)
    assert(trainN + testN == Tables.lineitem(spark, sf).count())
    // hash split lands near 20% (loose band — it's a hash, not a quota)
    val frac = testN.toDouble / (trainN + testN)
    assert(frac > 0.15 && frac < 0.25, s"test fraction drifted: $frac")
    // both AUCs are valid probabilities in ppm
    out.values.foreach(v => assert(v._3 >= 0L && v._3 <= 1000000L))
  }

  test("q_feature_importance: a label-determining feature takes its tree's whole importance; importances are non-negative; corpus rows cover every (tree, feature) that split") {
    import spark.implicits._
    import graft.operators.Round13Ops
    // y is a pure function of q; dd is noise — level-1 (q) splits buy
    // all the impurity decrease, level-2 (dd) splits buy none beyond
    // what pure nodes allow (gain 0 on pure children)
    val rows = (1 to 200).map { i =>
      val q = (i % 10 + 1).toLong
      (q, (i % 7).toLong, if (q <= 5) 1L else 0L, s"r$i")
    }.toDF("q", "dd", "y", "rid")
    val out = Round13Ops.featureImportancePipeline(rows).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    out.values.foreach(v => assert(v >= 0L, "negative importance"))
    (0 until 4).foreach { t =>
      val qImp = out.getOrElse((s"t$t", "l_quantity"), 0L)
      val dImp = out.getOrElse((s"t$t", "l_discount_cents"), 0L)
      assert(qImp > 0L, s"tree $t: the label-determining feature got 0")
      assert(dImp <= qImp / 100L,
        s"tree $t: noise feature importance $dImp not dwarfed by $qImp")
    }
    // corpus: non-negative and present for whatever split
    val corpus = Round13Ops.qFeatureImportance(spark, sf).collect()
      .map(r => r.getLong(2))
    assert(corpus.nonEmpty && corpus.forall(_ >= 0L))
  }

  test("q_gbt_importance: shares non-negative and bounded by the initial loss; the label feature dominates on a separable plant; corpus table re-derives from the trajectory") {
    import spark.implicits._
    import graft.operators.{Round12Ops, Round13Ops}
    // y determined by q (rounds 1/3 split q); dd is noise (round 2)
    val rows = (1 to 120).map { i =>
      val q = (i % 20 + 1).toLong
      (q, (i % 7).toLong, if (q <= 10) 1L else 0L)
    }.toDF("q", "dd", "y")
    val imp = Round13Ops.gbtImportanceFrom(
        Round12Ops.gbtPipeline(rows, Round12Ops.gbtRounds)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    imp.foreach { case (f, _, v) =>
      assert(v >= 0L, s"negative importance for $f") }
    // Σ shares ≤ the initial loss (+ ppm slack for the truncated-leaf
    // residual update: post-round SSE can sit a hair above split_sse)
    assert(imp.map(_._3).sum <= 1000000L + 10L,
      s"shares sum past the initial loss: ${imp.map(_._3).sum}")
    val qImp = imp.find(_._1 == "l_quantity").map(_._3).getOrElse(0L)
    val dImp = imp.find(_._1 == "l_discount_cents").map(_._3).getOrElse(0L)
    assert(qImp > 0L, "label-determining feature got zero importance")
    assert(dImp <= qImp / 100L,
      s"noise feature share $dImp not dwarfed by $qImp")
    // the served table (stored trajectory) ≡ re-deriving from a fresh
    // in-plan training on the same corpus — stored ≡ retrained
    val served = Round13Ops.qGbtImportance(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = Round13Ops.gbtImportanceFrom(
        Round12Ops.gbtPipeline(Round13Ops.evalRows(spark, sf),
          Round12Ops.gbtRounds)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == fresh,
      s"stored-trajectory importances drifted from retrained: $served vs $fresh")
  }

  test("q_model_compare: perfect agreement gives b=c=0 and both accuracies 10^6; a one-sided disagreement lands entirely in b; corpus cells are consistent") {
    import spark.implicits._
    import graft.operators.Round13Ops
    def row(df: org.apache.spark.sql.DataFrame) =
      Round13Ops.modelCompareFrom(df).collect().head
    val perfect = (1 to 100).map { i =>
      val y = (i % 2).toLong
      (y * 1000000L, y * 1000000L, y)
    }.toDF("s_g", "s_f", "y")
    val p = row(perfect)
    assert(p.getAs[Long]("n") == 100L)
    assert(p.getAs[Long]("agree_pos") == 50L
      && p.getAs[Long]("agree_neg") == 50L)
    assert(p.getAs[Long]("gbt_acc_ppm") == 1000000L
      && p.getAs[Long]("forest_acc_ppm") == 1000000L)
    assert(p.getAs[Long]("b_gbt_only_right") == 0L
      && p.getAs[Long]("c_forest_only_right") == 0L
      && p.getAs[Long]("mcnemar_x2_ppm") == 0L)
    // forest flips every 8th row; GBT stays right — all disagreement
    // mass must land in b, and χ² = (b-0)²·10⁶/b = b·10⁶
    val oneSided = (1 to 80).map { i =>
      val y = (i % 2).toLong
      val sf = if (i % 8 == 0) (1L - y) * 1000000L else y * 1000000L
      (y * 1000000L, sf, y)
    }.toDF("s_g", "s_f", "y")
    val o = row(oneSided)
    assert(o.getAs[Long]("b_gbt_only_right") == 10L
      && o.getAs[Long]("c_forest_only_right") == 0L)
    assert(o.getAs[Long]("mcnemar_x2_ppm") == 10L * 1000000L)
    assert(o.getAs[Long]("forest_acc_ppm") == 875000L)
    // corpus: cells partition the corpus; accuracies in [0, 10⁶]
    val c = Round13Ops.qModelCompare(spark, sf).collect().head
    val n = c.getAs[Long]("n")
    assert(n == Tables.lineitem(spark, sf).count())
    assert(c.getAs[Long]("agree_pos") + c.getAs[Long]("agree_neg")
      + c.getAs[Long]("only_gbt_pos") + c.getAs[Long]("only_forest_pos") == n)
    Seq("gbt_acc_ppm", "forest_acc_ppm").foreach { k =>
      val v = c.getAs[Long](k)
      assert(v >= 0L && v <= 1000000L, s"$k out of range: $v")
    }
  }

  test("q_cost_curve: a separable ranking reaches cost 0 at every ratio; corpus rows satisfy the cost identity and never beat the reject-all policy dishonestly") {
    import spark.implicits._
    import graft.operators.Round13Ops
    // perfectly ranked scores: some threshold separates classes, so
    // the optimal cut has FP = FN = 0 → cost 0 at ANY ratio
    val sep = (1 to 100).map { i =>
      val y = (i % 2).toLong
      (y * 1000000L, y)
    }.toDF("s", "y")
    val sepRows = Round13Ops.costCurveFrom(sep).collect()
    assert(sepRows.length == Round13Ops.costRatios.size)
    sepRows.foreach { r =>
      assert(r.getAs[Long]("total_cost") == 0L,
        s"separable ranking should cost 0, got $r")
      assert(r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L)
    }
    // corpus: one row per ratio, the emitted cost equals the identity
    // cfp·fp + cfn·fn, and the chosen cut is at least as cheap as
    // predicting everything positive (the lowest observed cut)
    val rows = Round13Ops.qCostCurve(spark, sf).collect()
    assert(rows.length == Round13Ops.costRatios.size)
    rows.foreach { r =>
      val (cfp, cfn) = (r.getAs[Long]("cost_fp"), r.getAs[Long]("cost_fn"))
      val cost = r.getAs[Long]("total_cost")
      assert(cost == cfp * r.getAs[Long]("fp") + cfn * r.getAs[Long]("fn"),
        s"cost identity violated on $r")
      val allPos = cfp * (r.getAs[Long]("fp") + r.getAs[Long]("tn"))
      assert(cost <= allPos,
        s"chosen cut costlier than predict-all-positive: $r")
    }
  }

  test("sample_slice_eval: slices partition the corpus; every per-slice AUC is a valid ppm; a separable relation scores 10^6 on every slice") {
    import spark.implicits._
    import graft.operators.Round13Ops
    val rows = Round13Ops.sampleSliceEval(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("pos") + r.getAs[Long]("neg")).sum
    assert(total == Tables.lineitem(spark, sf).count(),
      "slices must partition the corpus")
    rows.foreach { r =>
      val a = r.getAs[Long]("auc_ppm")
      assert(a >= 0L && a <= 1000000L, s"AUC out of range: $r")
    }
    // separable plant through the shared per-group machinery: scores
    // already separate classes within EVERY slice (slice = i mod 3 is
    // coprime with the label's i mod 2, so every slice sees both
    // classes — an i mod 4 slice would be single-class and score 0)
    val plant = (1 to 120).map { i =>
      val y = (i % 2).toLong
      ((i % 3).toLong, y * 1000000L, y)
    }.toDF("slice", "s", "y")
    Round13Ops.groupedAuc(plant, "slice").collect().foreach { r =>
      assert(r.getAs[Long]("auc_ppm") == 1000000L,
        s"separable slice below 10^6: $r")
    }
  }

  test("q_isotonic_calibration: PAV pools a hand-computed violation exactly; corpus fit is monotone and preserves bin mass") {
    import spark.implicits._
    import graft.operators.Round13Ops
    // bins: s=1 → 2/10 (200000), s=2 → 1/10 (100000), s=3 → 5/10.
    // PAV pools the (1,2) violation to 3/20 = 150000; bin 3 stays.
    val rows =
      (1 to 10).map(i => (1L, if (i <= 2) 1L else 0L)) ++
      (1 to 10).map(i => (2L, if (i <= 1) 1L else 0L)) ++
      (1 to 10).map(i => (3L, if (i <= 5) 1L else 0L))
    val out = Round13Ops.isotonicFrom(rows.toDF("s", "y")).collect()
      .map(r => r.getAs[Long]("score_ppm") ->
        (r.getAs[Long]("observed_ppm"), r.getAs[Long]("iso_ppm"))).toMap
    assert(out(1L) == ((200000L, 150000L)), s"bin 1: ${out(1L)}")
    assert(out(2L) == ((100000L, 150000L)), s"bin 2: ${out(2L)}")
    assert(out(3L) == ((500000L, 500000L)), s"bin 3: ${out(3L)}")
    // corpus: the fitted curve is non-decreasing in the score and
    // every fitted value is a valid ppm
    val corpus = Round13Ops.qIsotonicCalibration(spark, sf).collect()
      .map(r => (r.getAs[Long]("score_ppm"), r.getAs[Long]("iso_ppm")))
      .sortBy(_._1)
    corpus.sliding(2).foreach {
      case Array((s0, i0), (s1, i1)) =>
        assert(i0 <= i1, s"isotonic fit not monotone: ($s0,$i0) > ($s1,$i1)")
      case _ => ()
    }
    corpus.foreach { case (_, v) => assert(v >= 0L && v <= 1000000L) }
  }

  test("q_oob_eval: separable plant scores OOB AUC = 10^6; only out-of-bag-somewhere rows are scored") {
    import spark.implicits._
    import graft.operators.Round13Ops
    import graft.functions.gf
    val rows = (1 to 200).map { i =>
      val q = (i % 16 + 1).toLong
      (q, (i % 5).toLong, if (q <= 8) 1L else 0L, s"r$i")
    }.toDF("q", "dd", "y", "rid")
    val out = rocRows(Round13Ops.oobEvalPipeline(rows))
    assert(out.forall(_._4 == 1000000L),
      s"separable plant must give OOB AUC = 10^6, got ${out.map(_._4).head}")
    // the curve endpoint counts exactly the rows that are OOB for at
    // least one tree (independently recomputed)
    val oobRows = rows.withColumn("oobcnt",
      (0 until 4).map(t =>
        (gf.h32(concat(lit(s"frst:$t:"), col("rid"))) % 4 === 0)
          .cast("long")).reduce(_ + _))
      .filter(col("oobcnt") > 0).count()
    assert(out.last._2 + out.last._3 == oobRows,
      "scored-row count must equal the OOB-somewhere count")
    assert(oobRows < 200L, "some row should be in every bag (dropped)")
  }

  test("q_confusion: a separable plant yields J = 10^6, F1 = 10^6, and zero off-diagonal mass; the corpus matrix is internally consistent") {
    import spark.implicits._
    import graft.operators.Round13Ops
    val rows = (1 to 120).map { i =>
      val q = (i % 20 + 1).toLong
      (q, (i % 7).toLong, if (q <= 10) 1L else 0L)
    }.toDF("q", "dd", "y")
    val r = Round13Ops.confusionPipeline(rows).collect()
    assert(r.length == 1)
    val row = r.head
    val (tp, fp, fn, tn) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(fp == 0L && fn == 0L, s"off-diagonal mass on a separable plant: fp=$fp fn=$fn")
    assert(row.getLong(7) == 1000000L, "F1 must be 10^6")
    assert(row.getLong(8) == 1000000L, "Youden's J must be 10^6")
    assert(tp + tn == 120L)
    // corpus: the matrix adds up and the chosen point maximizes J
    val c = Round13Ops.qConfusion(spark, sf).collect().head
    val (ctp, cfp, cfn, ctn) =
      (c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4))
    assert(ctp + cfp + cfn + ctn == Tables.lineitem(spark, sf).count())
    assert(c.getLong(8) >= 0L, "the best J is at least the chance point")
  }

  test("q_cv_auc: folds partition the corpus exactly; a separable relation scores AUC = 10^6 on every fold; fold 0 equals the J18 test split") {
    import spark.implicits._
    import graft.operators.Round13Ops
    val rows = (1 to 250).map { i =>
      val q = (i % 16 + 1).toLong
      (q, (i % 5).toLong, if (q <= 8) 1L else 0L, s"r$i")
    }.toDF("q", "dd", "y", "rid")
    val out = Round13Ops.cvAucPipeline(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet == (0L until 5L).toSet,
      "every fold must emit a row")
    assert(out.map(r => r._2 + r._3).sum == 250L,
      "folds must partition the corpus exactly")
    out.foreach(r => assert(r._4 == 1000000L,
      s"fold ${r._1} AUC ${r._4} != 10^6 on a separable relation"))
    // protocol coherence on the corpus: fold 0 IS J18's test split
    val cv0 = Round13Ops.qCvAuc(spark, sf).collect()
      .find(_.getLong(0) == 0L).get
    val hold = Round13Ops.sampleHoldoutEval(spark, sf).collect()
      .find(_.getString(0) == "test").get
    assert(cv0.getLong(1) == hold.getLong(1)
      && cv0.getLong(2) == hold.getLong(2)
      && cv0.getLong(3) == hold.getLong(3),
      "CV fold 0 must equal the holdout test split's evaluation")
  }

  test("q_cv_auc: the joint shared-pass training equals five independent per-fold trainings bit-for-bit on noisy data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.operators.Round13Ops
    import graft.functions.gf
    // noisy labels: y depends on q with deliberate exceptions, so the
    // folds' models genuinely differ and AUC < 10^6
    val rows = (1 to 300).map { i =>
      val q = (i % 16 + 1).toLong
      val y = if ((q <= 8) != (i % 11 == 0)) 1L else 0L
      (q, (i % 6).toLong, y, s"r$i")
    }.toDF("q", "dd", "y", "rid")
    def rowSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val joint = rowSet(Round13Ops.cvAucPipeline(rows))
    // independent reference: one model per fold, trained and scored
    // separately (the naive 15-pass protocol)
    val data = rows.withColumn("fold",
      gf.h32(concat(lit("hold:"), col("rid"))) % Round13Ops.cvFolds)
      .persist()
    val ref = rowSet(Round13Ops.groupedAuc(
      (0 until Round13Ops.cvFolds).map { f =>
        val model = Round13Ops.gbtModelRow(
          data.filter(col("fold") =!= f).select("q", "dd", "y"))
        Round13Ops.gbtScore(data.filter(col("fold") === f), model)
          .select(lit(f.toLong).as("fold"), col("s"), col("y"))
      }.reduce(_ unionByName _), "fold"))
    assert(joint == ref,
      s"joint CV diverged from independent training:\n $joint\n $ref")
    assert(joint.exists(_._4 < 1000000L),
      "the plant was separable; the equality check proved nothing")
  }

  test("sample_learning_curve: every size evaluates the same held-out split; the full-pool size equals the holdout protocol; a separable relation scores 10^6 at every size") {
    import spark.implicits._
    import graft.operators.Round13Ops
    val rows = (1 to 300).map { i =>
      val q = (i % 16 + 1).toLong
      (q, (i % 5).toLong, if (q <= 8) 1L else 0L, s"r$i")
    }.toDF("q", "dd", "y", "rid")
    val out = Round13Ops.learningCurvePipeline(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet == (1L to 4L).toSet)
    // same held-out rows under every size
    assert(out.map(r => r._2 + r._3).distinct.length == 1,
      "sizes must evaluate the identical held-out split")
    out.foreach(r => assert(r._4 == 1000000L,
      s"size ${r._1}: AUC ${r._4} != 10^6 on a separable relation"))
    // corpus: the largest size trains on the full train pool — its
    // model IS J18's, so the rows must agree exactly
    val full = Round13Ops.sampleLearningCurve(spark, sf).collect()
      .find(_.getLong(0) == 4L).get
    val hold = Round13Ops.sampleHoldoutEval(spark, sf).collect()
      .find(_.getString(0) == "test").get
    assert(full.getLong(1) == hold.getLong(1)
      && full.getLong(2) == hold.getLong(2)
      && full.getLong(3) == hold.getLong(3),
      "the full-pool size must reproduce the holdout evaluation")
  }

  test("streaming_drift_psi: the streamed monitor equals the batch computation; identically-distributed slices give near-zero PSI") {
    import graft.streaming.StreamingTwins
    val out = StreamingTwins.streamingDriftPsi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(out.nonEmpty)
    // the slices are hash-thirds of one corpus — same distribution, so
    // total PSI must sit far under the 0.1 "stable" line
    val psi = out.map(_._4).sum
    assert(math.abs(psi) < 0.1, s"PSI $psi on identically-distributed slices")
    // counts conserve: ref + live = corpus
    assert(out.map(r => r._2 + r._3).sum
      == Tables.lineitem(spark, sf).count())
  }

  test("streaming_model_score: scoring on the stream lands the same evaluation as the batch scorer") {
    import graft.streaming.StreamingTwins
    import graft.operators.Round13Ops
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(StreamingTwins.streamingModelScore(spark, sf))
      == rows(Round13Ops.qGbtEval(spark, sf)),
      "streamed scoring diverged from the batch evaluation")
  }

  test("streaming_confusion_monitor: streamed outcome counts reproduce the batch decision certificate; monitor state is bounded at 4 rows") {
    import graft.streaming.StreamingTwins
    import graft.operators.Round13Ops
    val monitor = StreamingTwins.streamingConfusionMonitor(spark, sf)
      .collect().head.toSeq
    val batch = Round13Ops.qConfusion(spark, sf).collect().head.toSeq
    assert(monitor == batch,
      s"streamed confusion diverged from the batch certificate: " +
        s"$monitor vs $batch")
    // the complete-mode state the monitor carries is the (pred, y)
    // grid — ≤4 rows no matter how long the stream runs
    assert(spark.table("twin_confusion").count() <= 4L,
      "monitor state exceeded the 4-cell confusion grid")
  }
}
