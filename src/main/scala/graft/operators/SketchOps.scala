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
      .select(col("source"), gf.h32(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(MinHashAgg.minhash_agg_mod(col("h"), 64).as("sig"))
    val a = sigs.select(col("source").as("src1"), col("sig").as("sig1"))
    val b = sigs.select(col("source").as("src2"), col("sig").as("sig2"))
    a.join(b, col("src1") < col("src2"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          v => v)) / lit(64.0))
      .select(col("src1"), col("src2"), col("est_jaccard"))
  }

  /** DuckDB mirror of the portable group-MinHash: same md5-derived
    * 32-bit element hashes, same mod-(2^61-1) permutation family. */
  val sketchSourceSimilaritySql: String =
    """WITH h AS (
      |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
      |  FROM documents),
      |perm AS (
      |  SELECT j, 1 + ((j+1) * 2654435761) % 1073741824 AS a,
      |         ((j+1) * 1099511628211) % 2305843009213693951 AS b
      |  FROM range(64) t(j)),
      |mh AS (
      |  SELECT source, j, min((a * h + b) % 2305843009213693951) AS m
      |  FROM h, perm GROUP BY source, j)
      |SELECT m1.source AS src1, m2.source AS src2,
      |  CAST(sum(CASE WHEN m1.m = m2.m THEN 1 ELSE 0 END) AS DOUBLE) / 64
      |    AS est_jaccard
      |FROM mh m1 JOIN mh m2 ON m1.j = m2.j AND m1.source < m2.source
      |GROUP BY m1.source, m2.source""".stripMargin

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
    * constant/subquery sketch), pre-filter the probe side before any
    * shuffle, then run the exact semi-join over the survivors. This is
    * the runtime-filter pattern Spark injects automatically for
    * selective joins (spark.sql.optimizer.runtime.bloomFilter) made
    * explicit and composable. No false negatives (bloom property) and
    * no false positives (exact join) ⇒ the result is exactly the
    * semi-join, which is what the DuckDB oracle checks — while the
    * bloom keeps the pre-shuffle row count small at scale. */
  def bloomPrefilter(spark: SparkSession, sfDir: String): DataFrame = {
    val open = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O")
    val openKeys = open
      .agg(bloomAgg(xxhash64(col("o_custkey")), 2000L, 16000L).as("bf"))
    val bloomSub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      openKeys.queryExecution.analyzed)
    Tables.customer(spark, sfDir)
      .filter(Bridge.column(BloomFilterMightContain(bloomSub,
        Bridge.expression(xxhash64(col("c_custkey"))))))
      .join(open.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  val bloomPrefilterSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_source_similarity" -> sketchSourceSimilarity _,
    "sketch_bloom_prefilter" -> bloomPrefilter _
  )

  def oracleSql: Map[String, String] = Map(
    "sketch_source_similarity" -> sketchSourceSimilaritySql,
    "sketch_bloom_prefilter" -> bloomPrefilterSql
  )
}
