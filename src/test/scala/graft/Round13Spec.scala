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
}
