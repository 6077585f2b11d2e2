package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, concat, expr, lit}

import graft.functions.gf
import graft.operators.{ModelStore, Round12Ops, Round13Ops, Round15Ops}

/** Round 15 — the forest protocol family (B105 CV, J21 learning
  * curve, B106 per-fold McNemar) and the all-artifacts-joint GBT
  * build. */
class Round15Spec extends SparkSuite {

  private def aucRows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  /** Noisy labeled rows: y follows q with deliberate exceptions, so
    * per-fold forests genuinely differ and no AUC saturates. */
  private def noisyRows = {
    import spark.implicits._
    (1 to 400).map { i =>
      val q = (i % 16 + 1).toLong
      val y = if ((q <= 8) != (i % 13 == 0)) 1L else 0L
      (q, (i % 6).toLong, y, s"r$i")
    }.toDF("q", "dd", "y", "rid")
  }

  test("q_forest_cv_auc: the joint shared-level-loop training equals " +
      "five independently trained per-fold forests bit-for-bit") {
    val rows = noisyRows
    val joint = aucRows(Round15Ops.forestCvPipeline(rows))
    // independent reference: one solo forest per fold (B90's own
    // training + B94's own-bag leaf scores + stored-model scoring),
    // the naive folds×trees×levels protocol
    val data = rows.withColumn("fold",
      gf.h32(concat(lit("hold:"), col("rid"))) % Round13Ops.cvFolds)
      .persist()
    val trees = Round12Ops.forestTrees
    val ref = aucRows(Round13Ops.groupedAuc(
      (0 until Round13Ops.cvFolds).map { f =>
        val (model, ls) = Round13Ops.forestArtifactsOf(
          data.filter(col("fold") =!= f)
            .select(col("q"), col("dd"), col("y"), col("rid")))
        Round13Ops.forestScoreWith(
            data.filter(col("fold") === f), model, ls)
          .select(lit(f.toLong).as("fold"),
            expr((0 until trees).map(t => s"ls_$t")
              .mkString("(", " + ", s") div $trees")).as("s"),
            col("y"))
      }.reduce(_ unionByName _), "fold"))
    data.unpersist()
    assert(joint == ref,
      s"joint forest CV diverged from solo training:\n $joint\n $ref")
    assert(joint.exists(_._4 < 1000000L),
      "the plant was separable; the equality check proved nothing")
  }

  test("q_forest_cv_auc: folds partition the rows exactly and a " +
      "separable relation scores AUC = 10^6 on every fold") {
    import spark.implicits._
    val rows = (1 to 600).map { i =>
      val q = (i % 20 + 1).toLong
      (q, (i % 7).toLong, if (q <= 10) 1L else 0L, s"s$i")
    }.toDF("q", "dd", "y", "rid")
    val out = aucRows(Round15Ops.forestCvPipeline(rows))
    assert(out.size == Round13Ops.cvFolds)
    assert(out.map(r => r._2 + r._3).sum == 600,
      "per-fold pos+neg must partition the corpus")
    assert(out.forall(_._4 == 1000000L),
      s"separable plant must score 10^6 on every fold, got $out")
  }

  test("sample_forest_curve: every size evaluates the same held-out " +
      "fold and the full-pool size IS the CV fold-0 forest") {
    val rows = noisyRows
    val curve = aucRows(Round15Ops.forestCurvePipeline(rows))
    assert(curve.size == Round13Ops.cvFolds - 1)
    // one fixed evaluation set: every size's (pos, neg) is fold 0's
    assert(curve.map(r => (r._2, r._3)).size == 1,
      s"all sizes must score the same held-out rows: $curve")
    // size 4 trains on folds 1..4 = exactly the CV group-0 training
    // set, and both evaluate on fold 0 — the rows must agree
    val cv0 = aucRows(Round15Ops.forestCvPipeline(rows))
      .find(_._1 == 0L).get
    val full = curve.find(_._1 == 4L).get
    assert((full._2, full._3, full._4) == (cv0._2, cv0._3, cv0._4),
      s"curve size 4 must equal CV fold 0: $full vs $cv0")
  }

  test("q_model_compare_cv: grouped cells partition each fold, sum to " +
      "the global B102 arithmetic, and a planted one-sided " +
      "disagreement lands in b with chi^2 = b * 10^6") {
    import spark.implicits._
    // fold 0: GBT right on 3 rows the forest misses; elsewhere agree
    val scored = Seq(
      (0L, 900000L, 100000L, 1L), (0L, 900000L, 200000L, 1L),
      (0L, 700000L, 300000L, 1L), (0L, 800000L, 900000L, 1L),
      (1L, 100000L, 200000L, 0L), (1L, 900000L, 800000L, 1L))
      .toDF("fold", "s_g", "s_f", "y")
    val byFold = Round13Ops.modelCompareGrouped(scored, Seq("fold"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(8), r.getLong(9), r.getLong(10))).toMap
    assert(byFold(0L) == ((3L, 0L, 3000000L)),
      s"fold 0 must carry b=3, c=0, chi^2=3*10^6: ${byFold(0L)}")
    assert(byFold(1L) == ((0L, 0L, 0L)))
    // the grouped rows sum to the global comparison on the same rows
    val global = Round13Ops.modelCompareFrom(
      scored.select(col("s_g"), col("s_f"), col("y"))).collect().head
    val grouped = Round13Ops.modelCompareGrouped(scored, Seq("fold"))
      .collect()
    assert(grouped.map(_.getLong(1)).sum == global.getLong(0), "n")
    assert(grouped.map(_.getLong(8)).sum == global.getLong(7), "b")
    assert(grouped.map(_.getLong(9)).sum == global.getLong(8), "c")
  }

  test("q_forest_importance_cv: each fold's importances equal the solo " +
      "forest's B97 table on that fold's training set; all non-negative") {
    val rows = noisyRows
    val data = rows.withColumn("fold",
      gf.h32(concat(lit("hold:"), col("rid"))) % Round13Ops.cvFolds)
      .persist()
    val Seq(levels, _) = graft.operators.Round15Ops
      .forestCvArtifacts(graft.operators.Round15Ops.forestCells(data))
    val joint = Round13Ops.featureImportanceFrom(
      levels.select(
        expr("CAST(substring(node, 2, 1) AS BIGINT)").as("fold"),
        expr("substring(node, 3)").as("node"),
        col("level"), col("feature"), col("gini"), col("pp"), col("nn")),
      Seq("fold")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val solo = (0 until Round13Ops.cvFolds).flatMap { f =>
      Round13Ops.featureImportanceFrom(
        Round12Ops.forestLevelsFull(
          data.filter(col("fold") =!= f)
            .select(col("q"), col("dd"), col("y"), col("rid")),
          Round12Ops.forestTrees, Round12Ops.forestDepth))
        .collect()
        .map(r => (f.toLong, r.getString(0), r.getString(1), r.getLong(2)))
    }.toSet
    data.unpersist()
    assert(joint == solo,
      s"per-fold importances diverged from solo B97:\n $joint\n $solo")
    assert(joint.forall(_._4 >= 0L), "importances must be non-negative")
  }

  test("q_calibration_cv: out-of-fold bins conserve mass, every gap " +
      "satisfies its identity, and a separable plant calibrates " +
      "perfectly out of sample") {
    import graft.operators.Round15Ops
    val noisy = Round15Ops.calibrationCvPipeline(noisyRows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(noisy.map(_._2).sum == 400,
      "every row must be scored exactly once (by its own fold's model)")
    noisy.foreach { case (s, _, obs, gap) =>
      assert(gap == s - obs, s"gap identity broken at bin $s")
    }
    import spark.implicits._
    val sep = (1 to 600).map { i =>
      val q = (i % 20 + 1).toLong
      (q, (i % 7).toLong, if (q <= 10) 1L else 0L, s"c$i")
    }.toDF("q", "dd", "y", "rid")
    val bins = Round15Ops.calibrationCvPipeline(sep).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(bins.forall(_._2 == 0L),
      s"separable plant must have zero out-of-sample gaps: ${bins.toSeq}")
  }

  test("forest_cv_build: the 36-root joint pass publishes both store " +
      "keys bit-identical to the per-protocol builds") {
    import graft.operators.Round15Ops
    import graft.sources.StoreRoot
    val conf = java.nio.file.Files
      .createTempDirectory("graft_forest_joint").toString
    val before = spark.conf.getOption(StoreRoot.confKey)
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    try {
      spark.conf.set(StoreRoot.confKey, conf)
      ModelStore.forgetBuiltForTests()
      ModelStore.forestProtocolsBuild(spark, sf)
      val (cvL, cvS) = ModelStore.forestCvModel(spark, sf)
      val (lcL, lcS) = ModelStore.forestLcModel(spark, sf)
      val cells = Round15Ops.forestCells(
        Round13Ops.foldRidRows(spark, sf)).persist()
      val Seq(cvL2, cvS2) = Round15Ops.forestCvArtifacts(cells)
      val Seq(lcL2, lcS2) = Round15Ops.forestLcArtifacts(cells)
      cells.unpersist()
      Seq((cvL, cvL2, "cv levels"), (cvS, cvS2, "cv leaf scores"),
        (lcL, lcL2, "lc levels"), (lcS, lcS2, "lc leaf scores"))
        .foreach { case (s, r, what) =>
          assert(rows(s) == rows(r), s"$what diverged (joint vs solo)")
        }
    } finally {
      StoreRoot.deleteRecursively(java.nio.file.Paths.get(conf))
      ModelStore.forgetBuiltForTests()
      before match {
        case Some(v) => spark.conf.set(StoreRoot.confKey, v)
        case None => spark.conf.unset(StoreRoot.confKey)
      }
    }
  }

  test("gbt_model_build: the eleven-group joint pass publishes " +
      "artifacts bit-identical to the per-artifact solo builds") {
    import graft.sources.StoreRoot
    val conf = java.nio.file.Files
      .createTempDirectory("graft_joint_build").toString
    val before = spark.conf.getOption(StoreRoot.confKey)
    def rowSets(dfs: DataFrame*): Seq[Set[String]] =
      dfs.map(_.collect().map(_.toString).toSet)
    try {
      spark.conf.set(StoreRoot.confKey, conf)
      ModelStore.forgetBuiltForTests()
      ModelStore.gbtModelBuild(spark, sf)
      val stored = rowSets(
        ModelStore.gbtFull(spark, sf), ModelStore.gbtStumps(spark, sf),
        ModelStore.gbtHoldout(spark, sf),
        ModelStore.gbtCvWide(spark, sf), ModelStore.gbtLcWide(spark, sf))
      // solo reference: the exact derivations the standalone cold
      // paths (and the r14 build) used, straight off the base
      val base = Round13Ops.foldRows(spark, sf).persist()
      val rows = base.select(col("q"), col("dd"), col("y"))
      val soloStumps = Round12Ops.gbtPipeline(rows, Round12Ops.gbtRounds)
        .localCheckpoint(true)
      val solo = rowSets(
        Round13Ops.gbtModelRowFrom(soloStumps, rows),
        soloStumps,
        Round13Ops.gbtModelRow(
          base.filter(col("fold") =!= 0).select("q", "dd", "y")),
        Round13Ops.cvWideModelsFrom(base),
        Round13Ops.lcWideModelsFrom(base))
      base.unpersist()
      stored.zip(solo).zipWithIndex.foreach { case ((s, r), i) =>
        assert(s == r, s"artifact $i diverged (joint vs solo):\n $s\n $r")
      }
    } finally {
      StoreRoot.deleteRecursively(java.nio.file.Paths.get(conf))
      ModelStore.forgetBuiltForTests()
      before match {
        case Some(v) => spark.conf.set(StoreRoot.confKey, v)
        case None => spark.conf.unset(StoreRoot.confKey)
      }
    }
  }
}
