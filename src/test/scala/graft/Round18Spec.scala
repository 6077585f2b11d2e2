package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators.{AnnOps, Round16Ops, Round17Ops, Round18Ops}
import graft.sources.SegmentStore

/** Round 18 — epoch compaction for the capped ANN substrate (E32:
  * the rep-containment lemma executable, compaction ≡ fresh build,
  * real eviction, idempotence), the B112 fit-half-mass gate (both
  * arms + antitonicity in M), the r17 advisor guards (negative-score
  * sentinel, starved-trim assert), and the two-writer segment-store
  * rehearsal (r17 judge item #7). */
class Round18Spec extends SparkSuite {

  /** The Round16/17Spec synthetic raw embeddings (n × 64). */
  private def synthEmbN(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until 64).map { j =>
        ((gf.h32(concat(lit("e:"), col("id").cast("string"),
          lit(s":$j"))) % 2001 - 1000).cast("double") / 8000.0)
          .cast("float")
      }: _*).as("embedding"))

  /** A multi-epoch capped state over the synthetic clustered corpus —
    * the G29 arrival labels (epoch 0 = standing, 1..3 = the three
    * ingest batches): (emb, buckets, epoch rep segments). */
  private def multiEpochState: (DataFrame, DataFrame, DataFrame) = {
    val cemb = Round16Ops.clusteredEmbOver(synthEmbN(320))
      .localCheckpoint(true)
    val emb = cemb.select(col("vec_id"), col("v").as("embedding"))
    val b = AnnOps.signBucketsQ(emb, "vec_id", 4, 8).localCheckpoint(true)
    val segReps = Round17Ops.epochReps(
      b.withColumn("epoch",
        when(col("vec_id") % 10 === 4,
          expr("1 + (vec_id div 10) % 3")).otherwise(lit(0L))),
      Round17Ops.epochCap).localCheckpoint(true)
    (emb, b, segReps)
  }

  // --------------------------------------------- E32 epoch compaction

  test("E32 compaction: the compacted rep set ranked WITHIN the union " +
      "rep segments equals the fresh global rep set ranked over the " +
      "corpus (the containment lemma, executable) — and compaction " +
      "genuinely EVICTS reps (the multi-epoch union is strictly larger)") {
    val (_, b, segReps) = multiEpochState
    def repSet(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val compacted = repSet(Round18Ops.compactReps(segReps)
      .select(col("table_id").cast("int"), col("bucket"), col("dst")))
    val fresh = repSet(Round17Ops.epochReps(
        b.withColumn("epoch", lit(0L)), Round17Ops.epochCap)
      .select(col("table_id").cast("int"), col("bucket"), col("dst")))
    assert(compacted == fresh,
      s"segment-ranked rep set diverged from corpus-ranked: extra " +
        s"${(compacted -- fresh).take(5)}, missing " +
        s"${(fresh -- compacted).take(5)}")
    // eviction is real: the union carries reps the compacted set drops
    val unionN = segReps.select("table_id", "bucket", "dst")
      .distinct().count()
    assert(unionN > compacted.size,
      s"no rep evicted (union $unionN == compacted ${compacted.size}) " +
        "— the corpus exercises no multi-epoch overflow and the " +
        "compaction pin is vacuous")
  }

  test("E32 compaction: compactFrom over the multi-epoch segments " +
      "equals the fresh single-epoch capped build bit-for-bit, and " +
      "compacting the compacted state is a no-op (idempotence)") {
    val (emb, b, segReps) = multiEpochState
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val compacted = rows(Round18Ops.compactFrom(emb, b, segReps))
    val fresh = rows(Round16Ops.knnGraphBuildCapped(
      emb.select(col("vec_id"), col("embedding")), Round17Ops.epochCap))
    assert(compacted == fresh,
      s"compaction diverged from the fresh capped build: extra " +
        s"${(compacted -- fresh).take(5)}, missing " +
        s"${(fresh -- compacted).take(5)}")
    // idempotence: the compacted rep set IS a single-epoch rep
    // segment; compacting it again selects the same set
    val rc = Round18Ops.compactReps(segReps).localCheckpoint(true)
    val again = Round18Ops.compactReps(rc)
    assert(rc.count() == again.count() &&
      rc.exceptAll(again).isEmpty && again.exceptAll(rc).isEmpty,
      "compaction is not idempotent on a single-epoch state")
  }

  // ------------------------------------- G30 lifecycle ≡ rebuild

  test("streaming_ann_lifecycle: stream → scheduled compaction → " +
      "continued stream equals the rebuild under POST-COMPACTION " +
      "epoch labels bit-for-bit; the compaction evicts a wave-1 rep " +
      "(the reset is real); wave 2 contributes ≥2 epochs; and the " +
      "NO-compaction 7-epoch carry rebuild DIFFERS (the reset is " +
      "load-bearing)") {
    val cemb = Round16Ops.clusteredEmb(spark, sf).localCheckpoint(true)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val dir = Round18Ops.lifecycleDir(spark, sf)
    val merged = rows(Round18Ops.lifecycleMergedGraph(spark, dir))
    val rebuilt = rows(Round18Ops.lifecycleRebuild(cemb))
    assert(merged == rebuilt,
      s"lifecycle diverged from the post-compaction rebuild: extra " +
        s"${(merged -- rebuilt).take(5)}, missing " +
        s"${(rebuilt -- merged).take(5)}")
    // the compaction boundary did real work: some wave-1-era rep was
    // evicted when the 4 epochs collapsed to the global top-cap
    val compactedReps = SegmentStore.read(spark, s"$dir/reps")
      .filter(col("dst") % 10 =!= 7) // the compacted epoch-0 segment
      .select("table_id", "bucket", "dst").distinct().count()
    val b = graft.operators.AnnOps.signBucketsQ(
      cemb.filter(col("vec_id") % 10 =!= 7)
        .select(col("vec_id"), col("v").as("embedding")),
      "vec_id", 4, 8)
    val preW1Union = Round17Ops.epochReps(
      b.withColumn("epoch",
        when(col("vec_id") % 10 === 4,
          expr("1 + (vec_id div 10) % 3")).otherwise(lit(0L))),
      Round17Ops.epochCap).count()
    assert(preW1Union > compactedReps,
      s"compaction evicted nothing ($preW1Union -> $compactedReps) — " +
        "the boundary pin is vacuous")
    // wave 2 contributed its own epochs
    val w2RepBatches = SegmentStore.read(spark, s"$dir/reps")
      .filter(col("dst") % 10 === 7)
      .select(expr("(dst div 10) % 3").as("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(w2RepBatches.size >= 2,
      s"only wave-2 batches $w2RepBatches contributed reps")
    // the 7-epoch NO-compaction carry differs — the label reset the
    // compaction performs is semantic, not cosmetic
    val emb = cemb.select(col("vec_id"), col("v").as("embedding"))
    val bAll = graft.operators.AnnOps.signBucketsQ(emb, "vec_id", 4, 8)
    val carryReps = Round17Ops.epochReps(
      bAll.withColumn("epoch",
        when(col("vec_id") % 10 === 4, expr("1 + (vec_id div 10) % 3"))
          .when(col("vec_id") % 10 === 7, expr("4 + (vec_id div 10) % 3"))
          .otherwise(lit(0L))),
      Round17Ops.epochCap)
    val carryCand = bAll.select(col("table_id"), col("bucket"),
        col("vec_id").as("src"))
      .join(carryReps, Seq("table_id", "bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    val carry = rows(Round17Ops.top3(
      Round17Ops.scorePairs(carryCand, emb)))
    assert(carry != rebuilt,
      "carry and post-compaction rebuilds coincide — the corpus " +
        "exercises no compaction-boundary churn and the reset pin is " +
        "vacuous")
  }

  // --------------------------------------------- B112 fit-mass gate

  private def oosRows(rows: Seq[(Long, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("fold", "half", "s", "y")
  }

  /** Round17Spec's planted-overfit corpus (fit half: 20 rows over 2
    * bins = 10 rows/bin; held read 330000 → 240000 ppm). */
  private def overfitPlant(folds: Long): Seq[(Long, Long, Long, Long)] =
    (0L until folds).flatMap { f =>
      (0L until 2L).flatMap { h =>
        (0 until 10).map(i =>
          (f, h, 900000L, if (i < 6) 1L else 0L)) ++
          (0 until 10).map(i =>
            (f, h, 100000L, if (i < 4) 1L else 0L))
      }
    }

  test("q_calibration_oos_gated: a fold with fit mass past the gate " +
      "applies the fix and improves; the SAME fold under a stricter " +
      "gate ships identity untouched; the applied-fold set is " +
      "ANTITONE in M") {
    val rows = oosRows(overfitPlant(2))
    // m = 8: 20 fit rows ≥ 8 × 2 bins — the fix applies, and the read
    // is Round17Spec's hand computation (330000 → 240000)
    val applied = Round18Ops.calibrationOosGatedFrom(rows, 8L).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    applied.foreach { case (f, (fix, pre, post, imp)) =>
      assert(fix == 1L, s"fold $f gated off at m=8")
      assert(pre == 330000L && post == 240000L && imp == 90000L,
        s"fold $f gated read diverged: $pre -> $post ($imp)")
    }
    // m = 16: 20 < 16 × 2 — identity ships, the held half untouched
    val gated = Round18Ops.calibrationOosGatedFrom(rows, 16L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    gated.foreach { case (f, fix, pre, post, imp) =>
      assert(fix == 0L, s"fold $f applied past the gate at m=16")
      assert(post == pre && imp == 0L,
        s"fold $f identity arm changed the read: $pre -> $post ($imp)")
    }
    // the mass leg is a PER-BIN minimum, not an average (r18 review):
    // a fold whose fit half holds one fat bin (64 rows) and one 2-row
    // bin averages 33 rows/bin — but the 2-row bin's step value is
    // memorized noise, so the gate must ship identity
    val skewed = oosRows(
      (0 until 64).map(i =>
        (0L, 0L, 900000L, if (i < 38) 1L else 0L)) ++
      Seq((0L, 0L, 100000L, 1L), (0L, 0L, 100000L, 1L)) ++
      (0 until 10).map(i =>
        (0L, 1L, 900000L, if (i < 6) 1L else 0L)))
    Round18Ops.calibrationOosGatedFrom(skewed, 8L).collect()
      .foreach { r =>
        assert(r.getLong(2) == 0L,
          "a 2-row fit bin slipped past the per-bin mass gate " +
            "(average-form regression)")
      }
    // the SIGNAL leg: an already-CALIBRATED fold with plenty of mass
    // ships identity — the fit's (s − o) deviations are zero, so the
    // step would only ever fit noise (this corpus's measured regime)
    val calRows = oosRows((0L until 2L).flatMap { f =>
      (0L until 2L).flatMap { h =>
        (0 until 200).map(i =>
          (f, h, 600000L, if (i < 120) 1L else 0L)) ++
          (0 until 200).map(i =>
            (f, h, 400000L, if (i < 80) 1L else 0L))
      }
    })
    Round18Ops.calibrationOosGatedFrom(calRows, 8L).collect()
      .foreach { r =>
        assert(r.getLong(2) == 0L,
          s"fold ${r.getLong(0)}: calibrated-with-mass fold was not " +
            "gated off by the signal leg")
        assert(r.getLong(4) == r.getLong(3) && r.getLong(5) == 0L)
      }
    // antitone in M: the applied set never grows as the gate tightens
    val appliedSets = Seq(1L, 8L, 16L, 64L).map { m =>
      m -> Round18Ops.calibrationOosGatedFrom(rows, m).collect()
        .filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet
    }
    appliedSets.sliding(2).foreach {
      case Seq((mLo, aLo), (mHi, aHi)) =>
        assert(aHi.subsetOf(aLo),
          s"gate not antitone: m=$mHi applies ${aHi -- aLo} that " +
            s"m=$mLo does not")
      case _ => ()
    }
  }

  // ------------------------------------------- r17 advisor guards

  test("q_calibration_oos: a NEGATIVE score fails loudly instead of " +
      "silently dropping held bins past the s = -1 sentinel") {
    val rows = oosRows(Seq(
      (0L, 0L, 300000L, 1L), (0L, 0L, 700000L, 1L),
      (0L, 1L, -5L, 0L), (0L, 1L, 500000L, 1L)))
    val e = intercept[Exception] {
      Round17Ops.calibrationOosFrom(rows).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative score")),
      s"wrong failure: ${messages(e).take(3)}")
  }

  test("E28 exemplars: a corpus SMALLER than n_ex saturates the " +
      "threshold and passes the starved-trim guard (all rows selected, " +
      "no false assert)") {
    val tiny = spark.range(3).select(col("id").as("vec_id"))
    val got = Round16Ops.exemplars(tiny).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 2L), s"tiny corpus selected $got")
  }

  // ---------------------- two-writer segment-store rehearsal (#7)

  test("SegmentStore: two latch-released CONCURRENT writers both land " +
      "complete segments (no shared staging, no lost appends); a " +
      "reader never sees an in-flight staged segment; and the " +
      "maintenance merge over the two-writer store equals the fresh " +
      "rebuild (last-merge-wins)") {
    val dir = Files.createTempDirectory("graft_r18_seg").toString
    try {
      // the REAL G28 increment edge relation, split across two writers
      // (two ingest sessions feeding one store — the multi-writer
      // deployment shape the r17 rehearsals did not cover)
      val edges = Round17Ops.streamedSegmentEdges(spark, sf)
        .localCheckpoint(true)
      val h0 = edges.filter((col("src") + col("dst")) % 2 === 0)
        .localCheckpoint(true)
      val h1 = edges.filter((col("src") + col("dst")) % 2 =!= 0)
        .localCheckpoint(true)
      assert(h0.count() > 0 && h1.count() > 0, "degenerate split")
      // a planted IN-FLIGHT staged segment (a writer mid-append):
      // committed readers must never see it
      val stage = Paths.get(dir, "edges", ".stage_inflight")
      h0.limit(1).select(lit(-1L).as("src"), col("dst"), col("sim"))
        .write.parquet(stage.toString)
      // two writers, released together — truly concurrent appends
      val start = new CountDownLatch(1)
      val outcomes = new java.util.concurrent.ConcurrentHashMap[
        String, Either[Throwable, Unit]]()
      def writer(name: String, df: DataFrame) = new Thread(() => {
        start.await()
        outcomes.put(name,
          try Right(SegmentStore.append(df, s"$dir/edges"))
          catch { case e: Throwable => Left(e) })
      })
      val ta = writer("a", h0); val tb = writer("b", h1)
      ta.start(); tb.start(); start.countDown()
      ta.join(300000); tb.join(300000)
      Seq("a", "b").foreach { n =>
        outcomes.get(n) match {
          case Right(_) => ()
          case other => fail(s"writer $n died: $other")
        }
      }
      // snapshot read: both committed segments, the staged one ignored
      val read = SegmentStore.read(spark, s"$dir/edges")
        .localCheckpoint(true)
      assert(read.filter(col("src") === -1L).count() == 0,
        "a reader saw an in-flight staged segment")
      assert(read.count() == edges.count() &&
        read.exceptAll(edges).isEmpty && edges.exceptAll(read).isEmpty,
        "the two-writer store lost or duplicated segment rows")
      // last-merge-wins: the maintenance merge over this store is the
      // SAME merge G28 pins against the fresh rebuild
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      val merged = rows(Round17Ops.mergedGraphFrom(spark, sf, dir))
      val fresh = rows(Round16Ops.clusteredFreshGraph(spark, sf))
      assert(merged == fresh,
        s"two-writer merge diverged from rebuild: extra " +
          s"${(merged -- fresh).take(5)}, missing " +
          s"${(fresh -- merged).take(5)}")
    } finally {
      graft.sources.StoreRoot.deleteRecursively(Paths.get(dir))
    }
  }
}
