package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-shared store of TRAINED MODELS — the BpeStore/AnnIndexStore
  * lifecycle pattern applied to the evaluation family (SURVEY §2
  * B93-B100, J18/J19, G25/G26): a trained model is a written
  * artifact whose lifecycle is independent of any query, so training
  * runs ONCE per (corpus, protocol) per run and persists under the
  * resolved `graft.store.root` (H20 — a cluster points every
  * standing artifact at a shared object-store prefix with one
  * setting, and the per-JVM cache keys on the RESOLVED root, so an
  * A/B rebuild under a fresh root is a genuine cold build). Every
  * scorer then reads the standing artifact, so its bench row times
  * scoring + evaluation; the one-time trainings are carried by the
  * explicit `gbt_model_build` / `forest_model_build` Bench rows
  * (min-of-two-cold, the round-13 `_build` discipline).
  *
  * Stored ≡ retrained holds to the BIT: B91's trajectory is exact
  * ×10⁶ integer fixed point and B90's thresholds/leaf scores are
  * exact integers — every persisted column is BIGINT or STRING
  * except the forest levels' 6dp-rounded DOUBLE ginis, and parquet
  * round-trips doubles bit-exactly. So the DuckDB oracles, which
  * re-derive the identical trajectory from the shared training CTEs
  * (`gbtCtesFrom`/`forestCtes`), hash-match whether the Spark side
  * trained in-plan or read the store.
  *
  * Four GBT artifacts (they differ in TRAINING RELATION, not shape):
  *  - `gbt`    — the full-corpus B91 model row (B93/B96/B99 batch
  *               scorers, G25's deployed stream scorer, G26's drift
  *               reference);
  *  - `gbtho`  — J18's holdout model, trained on the 80% train split
  *               of the shared content-hash fold discipline;
  *  - `gbtcv`  — B100's five jointly-trained per-fold models (one
  *               wide row per fold);
  *  - `gbtlc`  — J19's four jointly-trained nested-subset models.
  * One forest artifact pair: the split table (level, node,
  * threshold) + each tree's own-bag leaf scores (node, ls), plus the
  * full per-level argmin relation (gini, pp, nn) B97's importances
  * read.
  */
object ModelStore {

  private def root(spark: SparkSession) =
    graft.sources.StoreRoot.resolve(spark, "graft-models")
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def get(spark: SparkSession, key: String, names: Seq[String])
      (build: => Seq[DataFrame]): Seq[DataFrame] = {
    val dir = root(spark).resolve(key)
    built.getOrElseUpdate(dir.toString, {
      // an artifact already persisted under a SHARED root (another
      // JVM trained it — the H20 cluster story) is reused as-is, the
      // IvmStateStore/SnapshotTable discipline: training is
      // deterministic, so reuse ≡ retrain, and an overwrite-rewrite
      // here would tear a concurrent reader's scan
      val complete = names.forall(n => java.nio.file.Files
        .exists(dir.resolve(n).resolve("_SUCCESS")))
      if (!complete) {
        names.zip(build).foreach { case (n, df) =>
          df.write.mode("overwrite").parquet(dir.resolve(n).toString)
        }
      }
    })
    names.map(n => spark.read.parquet(dir.resolve(n).toString))
  }

  private def ckey(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  private def gbtAll(spark: SparkSession, sfDir: String): Seq[DataFrame] =
    get(spark, "gbt_" + ckey(sfDir), Seq("model", "stumps")) {
      // ONE training pass serves both artifacts: the full per-round
      // stump table (threshold/leaves + the SSE trajectory B101's
      // importances read) and the pivoted 1-row scoring model
      val rows = Round13Ops.evalRows(spark, sfDir).persist()
      val stumps = Round12Ops.gbtPipeline(rows, Round12Ops.gbtRounds)
        .localCheckpoint(true)
      // both outputs are eagerly materialized (checkpointed) above,
      // so the corpus cache can drop before the store write — a
      // build must not leave a fact-table projection in the
      // BlockManager for the rest of a long-lived JVM
      val model = Round13Ops.gbtModelRowFrom(stumps, rows)
      rows.unpersist()
      Seq(model, stumps)
    }

  /** The standing full-corpus B91 model row (f0 + per-round
    * threshold/leaves) — the deployable artifact every batch and
    * streaming scorer broadcasts. */
  def gbtFull(spark: SparkSession, sfDir: String): DataFrame =
    gbtAll(spark, sfDir).head

  /** The full-corpus boosting trajectory (round, feature, threshold,
    * total_sse, split_sse, leaves) — B101's importance substrate. */
  def gbtStumps(spark: SparkSession, sfDir: String): DataFrame =
    gbtAll(spark, sfDir)(1)

  /** J18's model: the same trajectory trained on ONLY the 80% train
    * split of the shared content-hash discipline. */
  def gbtHoldout(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, "gbtho_" + ckey(sfDir), Seq("model")) {
      Seq(Round13Ops.gbtModelRow(
        Round13Ops.holdoutRows(spark, sfDir)
          .filter(col("split") === "train").select("q", "dd", "y")))
    }.head

  /** B100's five per-fold models as one wide row per fold (column
    * `g`), trained JOINTLY in shared passes. */
  def gbtCvWide(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, "gbtcv_" + ckey(sfDir), Seq("wide")) {
      Seq(Round13Ops.cvWideModels(spark, sfDir))
    }.head

  /** J19's four nested-subset models as one wide row per size
    * (column `g` = folds 1..g trained on). */
  def gbtLcWide(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, "gbtlc_" + ckey(sfDir), Seq("wide")) {
      Seq(Round13Ops.lcWideModels(spark, sfDir))
    }.head

  private def forestAll(spark: SparkSession,
      sfDir: String): Seq[DataFrame] =
    get(spark, "forest_" + ckey(sfDir),
        Seq("levels", "leaf_scores")) {
      // ONE training pass serves all three forest readers: the full
      // per-level argmin relation (B97's importances), the split
      // table projected from it, and the own-bag leaf scores routed
      // through it (B94/B98's scorers)
      val data = Round13Ops.ridRows(spark, sfDir).persist()
      val levels = Round12Ops.forestLevelsFull(data,
          Round12Ops.forestTrees, Round12Ops.forestDepth)
        .localCheckpoint(true)
      val model = levels.select(col("level"), col("node"), col("threshold"))
      // eager: the leaf scores close over the persisted corpus, so
      // materialize them BEFORE dropping the cache (see gbtAll)
      val leafScores = Round13Ops.routeForest(
          Round12Ops.forestBags(data, Round12Ops.forestTrees), model)
        .groupBy(col("node"))
        .agg(expr("1000000 * sum(y) div count(1)").as("ls"))
        .localCheckpoint(true)
      data.unpersist()
      Seq(levels, leafScores)
    }

  /** The forest's scoring artifacts: (split table, leaf scores). */
  def forestModel(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    val out = forestAll(spark, sfDir)
    (out.head.select(col("level"), col("node"), col("threshold")),
      out(1))
  }

  /** The forest's full per-level argmin relation (level, node,
    * feature, threshold, gini, pp, nn) — B97's substrate. */
  def forestLevels(spark: SparkSession, sfDir: String): DataFrame =
    forestAll(spark, sfDir).head

  /** Bench lifecycle hook: train every standing GBT artifact in one
    * timed pass (full + holdout + 5-fold joint + curve joint), so the
    * eight GBT-reading eval rows time a warm store read. */
  def gbtModelBuild(spark: SparkSession, sfDir: String): Unit = {
    gbtFull(spark, sfDir)
    gbtHoldout(spark, sfDir)
    gbtCvWide(spark, sfDir)
    gbtLcWide(spark, sfDir)
    ()
  }

  /** Bench lifecycle hook: the forest training pass. */
  def forestModelBuild(spark: SparkSession, sfDir: String): Unit = {
    forestAll(spark, sfDir)
    ()
  }
}
