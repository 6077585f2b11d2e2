package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Round12bOps

/** Round-12b specs: count-DISTINCT view maintenance chained across two
  * delta batches (support-count auxiliary state; each maintained view
  * ≡ a from-scratch recompute), and the exact fixed-point
  * two-regressor OLS — planted-plane recovery, a plain-Scala BigInt
  * reference on noisy data, and shift invariance of the slopes. */
class Round12bSpec extends SparkSuite {

  // ------------------------------------------------ warehouse_ivm_distinct

  private def snap(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "st", "cust")
  }

  private def viewMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))
    }.toMap

  private def recomputeView(snapshot: DataFrame): DataFrame =
    Round12bOps.ivmdView(Round12bOps.ivmdSupport(
      snapshot.select(col("st"), col("cust"))))

  test("warehouse_ivm_distinct: support-count state maintains COUNT(DISTINCT) through last-copy deletes, kept-copy deletes, group moves, and inserts; two batches chain") {
    // v0: cust 10 has TWO orders in O (delete one → distinct must NOT
    // drop); cust 11 has ONE order in O (delete it → distinct drops);
    // cust 12 in F
    val v0 = snap(Seq(
      (1L, "O", 10L), (2L, "O", 10L), (3L, "O", 11L), (4L, "F", 12L)))
    // batch 1: delete key 2 (cust 10 keeps one O order) and key 3
    // (cust 11's LAST O order); insert cust 13 into F
    val v1 = snap(Seq(
      (1L, "O", 10L), (4L, "F", 12L), (5L, "F", 13L)))
    // batch 2: key 1 MOVES O → F (cust 10 leaves O entirely, joins F
    // where cust 10 was absent); key 4's cust changes 12 → 13 (F's
    // order count holds, distinct drops — 13 already present)
    val v2 = snap(Seq(
      (1L, "F", 10L), (4L, "F", 13L), (5L, "F", 13L)))

    def delta(a: DataFrame, b: DataFrame): DataFrame =
      Round12bOps.ivmdDelta(
        a.select(col("key"), col("st"), col("cust")),
        b.select(col("key"), col("st").as("st2"),
          col("cust").as("cust2")))

    val s0 = Round12bOps.ivmdSupport(v0)
    val s1 = Round12bOps.ivmdMaintain(s0, delta(v0, v1))
    assert(viewMap(Round12bOps.ivmdView(s1))
      === viewMap(recomputeView(v1)))
    assert(viewMap(Round12bOps.ivmdView(s1))
      === Map("O" -> (1L, 1L), "F" -> (2L, 2L)))

    // chaining: batch 2 maintains BATCH 1's maintained state
    val s2 = Round12bOps.ivmdMaintain(s1, delta(v1, v2))
    assert(viewMap(Round12bOps.ivmdView(s2))
      === viewMap(recomputeView(v2)))
    // O emptied entirely; F: custs {10, 13} over 3 orders
    assert(viewMap(Round12bOps.ivmdView(s2))
      === Map("F" -> (2L, 3L)))
    // no zombie support rows survive at zero count
    assert(s2.filter(col("cnt") <= 0).count() === 0L)
  }

  test("warehouse_ivm_distinct on the corpus: maintained view equals the NEW-snapshot recompute; the 'G' group exists") {
    val out = viewMap(Round12bOps.warehouseIvmDistinct(spark, sf))
    val (_, neu) = Round12bOps.ivmdSnapshots(spark, sf)
    val expect = viewMap(recomputeView(
      neu.select(col("key"), col("st2").as("st"),
        col("cust2").as("cust"))))
    assert(out === expect)
    assert(out.contains("G"), "group-moving update must populate 'G'")
    // distinct strictly below order count somewhere (real aggregation)
    assert(out.values.exists { case (d, n) => d < n })
  }

  // ------------------------------------------------ q_linreg2

  private def fit(rows: Seq[(String, Long, Long, Long)]): Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    Round12bOps.linreg2Pipeline(rows.toDF("flag", "q", "dd", "pc"))
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
      }.toMap
  }

  test("q_linreg2: an exactly-planted integer plane is recovered exactly in ppm (slopes 3e6 / 2e6, intercept 7e6)") {
    // pc = 3q + 2dd + 7 over non-collinear (q, dd)
    val pts = for {
      q <- 0L to 12L; dd <- 0L to 9L
    } yield ("A", q, dd, 3 * q + 2 * dd + 7)
    val out = fit(pts)
    assert(out("A") === ((130L, 3000000L, 2000000L, 7000000L)))
  }

  /** Plain-Scala BigInt reference with the identical truncating
    * division (BigInt / truncates toward zero, like Spark div). */
  private def referenceFit(rows: Seq[(Long, Long, Long)]): (Long, Long, Long) = {
    val n = BigInt(rows.size)
    val (sq, sd, sp) = rows.foldLeft((BigInt(0), BigInt(0), BigInt(0))) {
      case ((a, b, c), (q, d, p)) => (a + q, b + d, c + p)
    }
    val (mq, md, mp) = (sq / n, sd / n, sp / n)
    var (su, sv, sw) = (BigInt(0), BigInt(0), BigInt(0))
    var (suu, suv, svv, suw, svw) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    rows.foreach { case (q, d, p) =>
      val (u, v, w) = (q - mq, d - md, p - mp)
      su += u; sv += v; sw += w
      suu += u * u; suv += u * v; svv += v * v
      suw += u * w; svw += v * w
    }
    val a11 = n * suu - su * su; val a12 = n * suv - su * sv
    val a22 = n * svv - sv * sv
    val b1 = n * suw - su * sw; val b2 = n * svw - sv * sw
    val det = a11 * a22 - a12 * a12
    val b1ppm = (b1 * a22 - b2 * a12) * 1000000 / det
    val b2ppm = (a11 * b2 - a12 * b1) * 1000000 / det
    val icept = BigInt(1000000) * mp +
      (BigInt(1000000) * sw - b1ppm * su - b2ppm * sv) / n -
      b1ppm * mq - b2ppm * md
    (b1ppm.toLong, b2ppm.toLong, icept.toLong)
  }

  test("q_linreg2: noisy integer data matches a plain-Scala BigInt reference with identical truncation") {
    // deterministic pseudo-noise; two groups with different planes
    val rows = (0 until 300).map { i =>
      val flag = if (i % 2 == 0) "E" else "O"
      val q = (i * 13 % 37).toLong
      val dd = (i * 7 % 11).toLong
      val base = if (flag == "E") 5 * q + 11 * dd + 250
                 else 17 * q - 3 * dd + 90
      (flag, q, dd, base + (i * i % 97) - 48)
    }
    val out = fit(rows)
    Seq("E", "O").foreach { f =>
      val grp = rows.filter(_._1 == f).map(t => (t._2, t._3, t._4))
      val (b1, b2, ic) = referenceFit(grp)
      assert(out(f) === ((grp.size.toLong, b1, b2, ic)),
        s"group $f disagrees with the BigInt reference")
    }
  }

  test("q_linreg2: slopes are invariant to a constant shift of a regressor; the intercept moves by exactly slope x shift") {
    val rows = (0 until 200).map { i =>
      ("S", (i * 13 % 37).toLong, (i * 7 % 11).toLong,
        (5 * (i * 13 % 37) + 11 * (i * 7 % 11) + (i * i % 89)).toLong)
    }
    val base = fit(rows)("S")
    val shifted = fit(rows.map { case (f, q, d, p) => (f, q + 1000, d, p) })("S")
    assert(shifted._2 === base._2 && shifted._3 === base._3,
      "slopes must be shift-invariant")
    assert(shifted._4 === base._4 - base._2 * 1000L,
      "intercept must move by exactly -slope_qty x 1000")
  }

  // ------------------------------------------------ knn_graph_incremental

  test("knn_graph_incremental: folding the batch into the standing graph equals the full rebuild; the split is non-degenerate") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val incremental = rows(Round12bOps.knnGraphIncremental(spark, sf))
    val rebuild = rows(graft.operators.AnnOps.knnGraph(spark, sf))
    assert(incremental === rebuild,
      "incremental maintenance diverged from the full rebuild")
    // non-degeneracy: the batch exists, some standing rows survive
    // untouched, and some new srcs entered the graph — otherwise the
    // top-k-monotonicity claim goes unexercised
    val srcs = incremental.map(_._1)
    assert(srcs.exists(_ % 10 == 4), "no new-batch srcs in the graph")
    assert(srcs.exists(_ % 10 != 4), "no standing srcs in the graph")
    val affected = incremental.filter(t => t._3 % 10 == 4).map(_._1)
    assert(affected.nonEmpty, "no src gained a new-batch neighbor")
    assert((srcs -- affected).nonEmpty,
      "every src was re-ranked; nothing passed through untouched")
  }

  // ------------------------------------------------ dedup_cc_incremental

  test("dedup_cc_incremental: folding the re-ingested batch into the standing labels equals the full re-clustering; the split is non-degenerate") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val incremental = rows(Round12bOps.dedupCcIncremental(spark, sf))
    val full = graft.operators.DedupOps.corpus(Tables.documents(spark, sf))
    val rebuild = rows(graft.operators.ClusterOps.connectedComponents(
        graft.operators.DedupOps.minhashPipeline(full, 0.5))
      .select(col("doc_id"), col("cluster_id")))
    assert(incremental === rebuild,
      "incremental maintenance diverged from the full re-clustering")
    // non-degeneracy: batch docs entered the labels, some component
    // spans the batch and the standing corpus (a real merge), and some
    // standing component has no batch member (a real fall-through) —
    // otherwise the contraction + relabel logic goes unexercised
    val off = graft.operators.DedupOps.ExactCopyOffset
    val byCluster = incremental.groupBy(_._2)
    assert(incremental.exists(_._1 >= off), "no batch docs in the labels")
    assert(byCluster.exists { case (_, m) =>
      m.exists(_._1 >= off) && m.exists(_._1 < off) },
      "no component spans the batch and the standing corpus")
    assert(byCluster.exists { case (_, m) => m.forall(_._1 < off) },
      "every component gained a batch member; nothing fell through untouched")
  }

  // ------------------------------------------------ dedup_cc_decremental

  test("dedup_cc_decremental: confining the recluster to affected components equals the post-delete re-clustering; deletes, fall-throughs, and attrition all occur") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val decremental = rows(Round12bOps.dedupCcDecremental(spark, sf))
    val full = graft.operators.DedupOps.corpus(Tables.documents(spark, sf))
    val standing = rows(graft.operators.ClusterOps.connectedComponents(
        graft.operators.DedupOps.minhashPipeline(full, 0.5))
      .select(col("doc_id"), col("cluster_id")))
    val rebuild = rows(graft.operators.ClusterOps.connectedComponents(
        graft.operators.DedupOps.minhashPipeline(
          full.filter(col("doc_id") % 7 =!= 3), 0.5))
      .select(col("doc_id"), col("cluster_id")))
    assert(decremental === rebuild,
      "confined maintenance diverged from the post-delete re-clustering")
    // non-degeneracy: the delete batch hit standing components, some
    // component fell through untouched, attrition dropped a surviving
    // doc whose last edge died, and a touched component survived with
    // members — otherwise the confinement logic goes unexercised
    val affectedLbls = standing.filter(_._1 % 7 == 3).map(_._2)
    assert(affectedLbls.nonEmpty, "no standing component lost a member")
    val untouchedLbls = standing.map(_._2) -- affectedLbls
    assert(untouchedLbls.nonEmpty, "every component lost a member")
    assert(decremental.forall(_._1 % 7 != 3), "a deleted doc survived")
    val survivorsGone = standing.collect {
      case (d, l) if d % 7 != 3 && affectedLbls(l) &&
        !decremental.exists(_._1 == d) => d
    }
    assert(survivorsGone.nonEmpty,
      "no attrition: every affected-component survivor kept an edge")
    assert(decremental.exists { case (d, _) =>
      standing.exists(s => s._1 == d && affectedLbls(s._2)) },
      "no touched component survived with members")
  }

  test("q_linreg2 on the corpus: every flag's fit equals the BigInt reference over the same integer rows") {
    val out = Round12bOps.qLinreg2(spark, sf).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    }.toMap
    assert(out.size === 3)
    val rows = Tables.lineitem(spark, sf).select(
        col("l_returnflag"), col("l_quantity").cast("long"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    rows.groupBy(_._1).foreach { case (f, grp) =>
      val pts = grp.map(_._2).toSeq
      val (b1, b2, ic) = referenceFit(pts)
      assert(out(f) === ((pts.size.toLong, b1, b2, ic)),
        s"flag $f disagrees with the BigInt reference on the corpus")
    }
  }
}
