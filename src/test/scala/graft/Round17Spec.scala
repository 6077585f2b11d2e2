package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.gf
import graft.operators.{ModelStore, Round16Ops}
import graft.sources.SnapshotTable

/** Round 17 — the scan-side exemplar threshold (judge item #1a), the
  * B110 sign-safe transfer read, the ModelStore trash-sweep age gate
  * (r16 advisor), and the two-session concurrency rehearsals for the
  * stores (judge item #5). */
class Round17Spec extends SparkSuite {

  /** The Round16Spec synthetic raw embeddings (320 × 64). */
  private def synthEmb: DataFrame =
    spark.range(320).select(col("id").as("vec_id"),
      array((0 until 64).map { j =>
        ((gf.h32(concat(lit("e:"), col("id").cast("string"),
          lit(s":$j"))) % 2001 - 1000).cast("double") / 8000.0)
          .cast("float")
      }: _*).as("embedding"))

  // ------------------------------------ E28 exemplar selection (item #1a)

  /** The OLD global rank-window rule, re-derived independently — the
    * contract the scan-side threshold must reproduce exactly. */
  private def windowExemplars(cemb: DataFrame): Set[Long] = {
    val n = cemb.count()
    val nEx = 2 * math.ceil(math.sqrt(n.toDouble)).toInt
    cemb.select(col("vec_id").as("nid"),
        gf.h32(concat(lit("lseed:"), col("vec_id").cast("string")))
          .as("h"))
      .orderBy(col("h"), col("nid")).limit(nEx)
      .collect().map(_.getLong(0)).toSet
  }

  test("E28 exemplars: the scan-side hash threshold + exact trim " +
      "selects EXACTLY the global rank-window set (synthetic corpus " +
      "and the real sf0.01 clustered corpus)") {
    // synthetic 320-vector corpus (N ≤ 4·n_ex here, so the threshold
    // saturates and the trim IS the rule — the small-corpus branch)
    val cembS = Round16Ops.clusteredEmbOver(synthEmb)
    val gotS = Round16Ops.exemplars(cembS)
      .collect().map(_.getLong(0)).toSet
    assert(gotS == windowExemplars(cembS),
      "synthetic: threshold-selected diverged from window-selected")
    // the real sf0.01 clustered corpus (N ≫ 4·n_ex: the filter is a
    // strict scan-side cut and the window sorts only the survivors)
    val cembR = Round16Ops.clusteredEmb(spark, "/root/testdata/sf0.01")
    val gotR = Round16Ops.exemplars(cembR)
      .collect().map(_.getLong(0)).toSet
    val wantR = windowExemplars(cembR)
    assert(gotR.size == wantR.size && gotR == wantR,
      s"sf0.01: threshold set (${gotR.size}) != window set " +
        s"(${wantR.size}); sym-diff ${(gotR -- wantR) ++ (wantR -- gotR)}")
  }

  test("E28 exemplars: the threshold pre-filter keeps a strict " +
      "superset of the selected set with O(√N) survivors — the " +
      "corpus-wide sort is gone") {
    val cemb = Round16Ops.clusteredEmb(spark, "/root/testdata/sf0.01")
    val n = cemb.count()
    val nEx = 2 * math.ceil(math.sqrt(n.toDouble)).toLong
    val thr = math.min(4294967296L, 4294967296L * 4 * nEx / n)
    val survivors = cemb.select(
        gf.h32(concat(lit("lseed:"), col("vec_id").cast("string")))
          .as("h"))
      .filter(col("h") < thr).count()
    assert(survivors >= nEx,
      s"pre-filter kept $survivors < n_ex=$nEx — the trim would starve")
    // the ×4 margin keeps the survivor relation O(√N), not O(N):
    // binomial mean 4·n_ex, so ~8·n_ex bounds it with huge slack
    assert(survivors <= 8 * nEx,
      s"pre-filter kept $survivors rows (n_ex=$nEx) — not scan-side")
  }

  // ----------------------------------------- B110 sign-safe read

  test("q_threshold_transfer: a transferred rule WORSE than chance " +
      "reads sign-safely — youden_transfer_ppm is exactly " +
      "youden_local_ppm − regret_ppm, negative, with a non-divisible " +
      "numerator (the Spark-div/DuckDB-// divergence case)") {
    import spark.implicits._
    // fold 0 (eval): pos {2×100000, 1×700000}, neg {3×900000} —
    // every high cut is anti-separable: cut 700000 has
    // j_num = tp·nn − fp·pp = 1·3 − 3·3 = −6 over denom pp·nn = 9
    // (−6·10⁶/9 = −666666.67: floor −666667, trunc −666666 — the
    // exact divergence the identity form closes). Local optimum is
    // the reject-all sentinel (J = 0). Folds 1-4 are separable at
    // 500000, so the transferred thr 500000 snaps UP to fold 0's
    // 700000 cut.
    val rows = (
      Seq((0L, 100000L, 1L), (0L, 100000L, 1L), (0L, 700000L, 1L),
        (0L, 900000L, 0L), (0L, 900000L, 0L), (0L, 900000L, 0L)) ++
      (1L until 5L).flatMap(f => Seq(
        (f, 500000L, 1L), (f, 500000L, 1L), (f, 300000L, 0L),
        (f, 300000L, 0L)))
    ).toDF("fold", "s", "y")
    val out = Round16Ops.thresholdTransferFrom(rows).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    val (jLocal, thrT, jTransfer, regret) = out(0L)
    assert(thrT == 500000L, s"transfer thr $thrT")
    assert(jLocal == 0L, s"local J $jLocal (sentinel expected)")
    assert(regret == 666666L, s"regret $regret (floor of 6e6/9)")
    // the identity, and the honest negative read
    assert(jTransfer == jLocal - regret,
      s"identity broken: $jTransfer != $jLocal - $regret")
    assert(jTransfer == -666666L, s"youden_transfer $jTransfer")
  }

  // ------------------------------ ModelStore trash-sweep age gate

  test("ModelStore sweep: an AGED .trash orphan is collected, a FRESH " +
      "one (a concurrent heal's parked artifact) survives, and after " +
      "the in-flight heal completes the artifact is intact") {
    val origRoot = spark.conf.getOption(sources.StoreRoot.confKey)
    val fresh = Files.createTempDirectory("graft_r17_trash")
    try {
      spark.conf.set(sources.StoreRoot.confKey, fresh.toString)
      // writer 1 publishes the real artifact
      val m0 = ModelStore.gbtFull(spark, sf)
      val rows0 = m0.collect().toSeq
      val keyDir = fresh.resolve("graft-models")
        .resolve("gbt_" + sf.replaceAll("[^A-Za-z0-9.]", "_"))
      assert(Files.exists(keyDir.resolve("model").resolve("_SUCCESS")))
      // an AGED orphan (a writer crashed mid-heal an hour ago) and a
      // FRESH parked dir (a heal's move-aside is in flight RIGHT NOW
      // — it contains a COMPLETE artifact about to be moved back)
      val aged = keyDir.resolve("model.trash111")
      Files.createDirectories(aged)
      Files.writeString(aged.resolve("part-0"), "stale")
      Files.setLastModifiedTime(aged,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 3600L * 1000))
      val parked = keyDir.resolve("stumps.trash222")
      // park the COMPLETE stumps artifact exactly as publish()'s
      // move-aside would — the advisor's flicker scenario
      Files.move(keyDir.resolve("stumps"), parked)
      // a second session (same shared root, fresh JVM simulated)
      // arrives and runs the sweep inside get()
      ModelStore.forgetBuiltForTests()
      val sess2 = spark.newSession()
      sess2.conf.set(sources.StoreRoot.confKey, fresh.toString)
      val m1 = ModelStore.gbtFull(sess2, sf)
      assert(m1.collect().toSeq == rows0,
        "second session read a different model")
      assert(!Files.exists(aged), "aged orphan survived the sweep")
      assert(Files.exists(parked.resolve("_SUCCESS")),
        "the sweep collected an in-flight heal's parked artifact — " +
          "the move-back would now fail and force a spurious rebuild")
      // the in-flight heal completes: its move-back must still work
      // (get() rebuilt stumps — first-committer-wins, so the parked
      // copy is the LOSER and is discarded by the heal protocol; a
      // crashed heal would leave it for the AGED sweep instead)
      if (Files.exists(keyDir.resolve("stumps").resolve("_SUCCESS")))
        sources.StoreRoot.deleteRecursively(parked)
      else
        Files.move(parked, keyDir.resolve("stumps"))
      assert(Files.exists(
        keyDir.resolve("stumps").resolve("_SUCCESS")))
    } finally {
      origRoot match {
        case Some(r) => spark.conf.set(sources.StoreRoot.confKey, r)
        case None => spark.conf.unset(sources.StoreRoot.confKey)
      }
      ModelStore.forgetBuiltForTests()
      sources.StoreRoot.deleteRecursively(fresh)
    }
  }

  // --------------------- two-session concurrency rehearsals (item #5)

  test("SnapshotTable race: two sessions stage from the same base; " +
      "the first publish wins, the loser's publish REFUSES (first-" +
      "committer-wins), its abort discards exactly the staged data, " +
      "a re-stage lands, and no reader ever sees a torn table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r17_snap").toString
    val t = new SnapshotTable(spark, dir, "k", buckets = 4,
      keepSnapshots = 4)
    t.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val v0 = t.version
    // session B gets its OWN handle over the same path (two JVMs
    // sharing a lakehouse dir — the handle carries no shared state
    // beyond the files)
    val sessB = spark.newSession()
    val tB = new SnapshotTable(sessB, dir, "k", buckets = 4,
      keepSnapshots = 4)
    // both stage from the SAME base version
    val stageA = t.stageMerge(Seq((2L, "A2")).toDF("k", "v"))
    val stageB = tB.stageMerge(
      Seq((3L, "B3"), (4L, "B4")).toDF("k", "v"))
    // interleave via a latch: B's publish fires only after A's landed
    val aDone = new CountDownLatch(1)
    val bOutcome = new java.util.concurrent.atomic.AtomicReference[
      Either[Throwable, Unit]]()
    val bThread = new Thread(() => {
      aDone.await()
      bOutcome.set(
        try Right(stageB.publish())
        catch { case e: Throwable => Left(e) })
    })
    bThread.start()
    stageA.publish()
    val v1 = t.version
    assert(v1 == v0 + 1)
    aDone.countDown()
    bThread.join(60000)
    // B lost: its publish must REFUSE (publishing would silently drop
    // A's buckets), loudly
    bOutcome.get() match {
      case Left(e) => assert(
        e.getMessage.contains("concurrent commit detected"),
        s"loser failed for the wrong reason: ${e.getMessage}")
      case Right(_) => fail("the stale staged merge published over " +
        "a concurrent commit")
    }
    // reader-visible state is exactly A's commit — never torn
    val afterA = t.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterA == Map(1L -> "a", 2L -> "A2", 3L -> "c"))
    // the loser aborts: exactly its staged dirs go, the table doesn't
    // move
    stageB.abort()
    assert(t.version == v1)
    assert(t.read().collect().length == 3)
    // and the documented recovery: re-stage against the NEW snapshot
    val retry = tB.stageMerge(
      Seq((3L, "B3"), (4L, "B4")).toDF("k", "v"))
    retry.publish()
    assert(t.version == v1 + 1)
    val fin = t.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == Map(1L -> "a", 2L -> "A2", 3L -> "B3", 4L -> "B4"))
    // time travel still serves every retained snapshot
    assert(t.readAsOf(v0).collect().map(_.getString(1)).sorted.toSeq
      == Seq("a", "b", "c"))
    t.drop()
  }

  test("ModelStore race: two sessions over one shared root race the " +
      "same missing artifact — both read identical complete models, " +
      "exactly one copy is installed, no torn state or tmp leak") {
    val origRoot = spark.conf.getOption(sources.StoreRoot.confKey)
    val fresh = Files.createTempDirectory("graft_r17_race")
    try {
      spark.conf.set(sources.StoreRoot.confKey, fresh.toString)
      ModelStore.forgetBuiltForTests()
      val sess2 = spark.newSession()
      sess2.conf.set(sources.StoreRoot.confKey, fresh.toString)
      val start = new CountDownLatch(1)
      val results = new java.util.concurrent.ConcurrentHashMap[
        String, Either[Throwable, Seq[org.apache.spark.sql.Row]]]()
      def racer(name: String, s: org.apache.spark.sql.SparkSession) =
        new Thread(() => {
          start.await()
          results.put(name,
            try Right(ModelStore.gbtHoldout(s, sf).collect().toSeq)
            catch { case e: Throwable => Left(e) })
        })
      val ta = racer("a", spark); val tb = racer("b", sess2)
      ta.start(); tb.start(); start.countDown()
      ta.join(300000); tb.join(300000)
      val a = results.get("a"); val b = results.get("b")
      (a, b) match {
        case (Right(ra), Right(rb)) =>
          assert(ra == rb, "the two sessions read different models")
          assert(ra.nonEmpty)
        case other => fail(s"a racer died: $other")
      }
      val keyDir = fresh.resolve("graft-models")
        .resolve("gbtho_" + sf.replaceAll("[^A-Za-z0-9.]", "_"))
      assert(Files.exists(keyDir.resolve("model").resolve("_SUCCESS")),
        "no complete artifact after the race")
      // no torn residue: every surviving sibling is either the
      // artifact or (transiently) a fresh .trash park — never a tmp
      val leftovers = {
        val s = Files.list(keyDir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toList
        } finally s.close()
      }
      assert(!leftovers.exists(_.contains(".tmp")),
        s"leaked tmp dirs: $leftovers")
    } finally {
      origRoot match {
        case Some(r) => spark.conf.set(sources.StoreRoot.confKey, r)
        case None => spark.conf.unset(sources.StoreRoot.confKey)
      }
      ModelStore.forgetBuiltForTests()
      sources.StoreRoot.deleteRecursively(fresh)
    }
  }
}
