package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Bridge

import graft.Tables
import graft.functions.{gf, MinHashAgg}

/** Sketch-based operators (SURVEY.md §2.I): group-level MinHash
  * signatures via the custom TypedImperativeAggregate, and explicit
  * bloom-filter semi-join pre-filtering — the two sketches that keep
  * 100 TB set-similarity and selective joins cheap.
  */
object SketchOps {

  // ---------------------------------------------------------------- I1
  /** Per-source MinHash signature (64 perms) aggregated from document
    * content hashes, then pairwise source-level Jaccard estimates.
    * The aggregate's merge is an elementwise unsigned min —
    * associative/commutative, so map-side partial aggregation is exact
    * under any partitioning. 20 sources here → all pairs; at scale the
    * signatures would feed the same LSH banding as document dedup. */
  def sketchSourceSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val sigs = docs
      .select(col("source"), gf.rolling_hash64(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(MinHashAgg.minhash_agg(col("h"), 64, 42L).as("sig"))
    val a = sigs.select(col("source").as("src1"), col("sig").as("sig1"))
    val b = sigs.select(col("source").as("src2"), col("sig").as("sig2"))
    a.join(b, col("src1") < col("src2"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          v => v)) / lit(64.0))
      .select(col("src1"), col("src2"), col("est_jaccard"))
  }

  // ---------------------------------------------------------------- I2
  private def bloomAgg(c: Column, items: Long, bits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(c),
      Literal(items), Literal(bits)).toAggregateExpression())

  private def mightContain(bloom: Column, c: Column): Column =
    Bridge.column(BloomFilterMightContain(Bridge.expression(bloom),
      Bridge.expression(c)))

  /** Explicit bloom-filter semi-join pre-filter: build a bloom over
    * open-order customer keys (order-independent bit OR → result is
    * deterministic) as a scalar subquery (`might_contain` requires a
    * constant/subquery sketch), and pre-filter the probe side before
    * any shuffle. This is the runtime-filter pattern Spark injects
    * automatically for selective joins
    * (spark.sql.optimizer.runtime.bloomFilter) made explicit and
    * composable; guarantees no false negatives. */
  def bloomPrefilter(spark: SparkSession, sfDir: String): DataFrame = {
    val openKeys = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O")
      .agg(bloomAgg(xxhash64(col("o_custkey")), 2000L, 16000L).as("bf"))
    val bloomSub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      openKeys.queryExecution.analyzed)
    Tables.customer(spark, sfDir)
      .filter(Bridge.column(BloomFilterMightContain(bloomSub,
        Bridge.expression(xxhash64(col("c_custkey"))))))
      .select(col("c_custkey"), col("c_name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_source_similarity" -> sketchSourceSimilarity _,
    "sketch_bloom_prefilter" -> bloomPrefilter _
  )

  /** Both sketches are engine-internal → rows-only driver checks;
    * semantics pinned in SketchSpec (partitioning-independence for the
    * aggregate, zero false negatives for the bloom). */
  def oracleSql: Map[String, String] = Map.empty
}
