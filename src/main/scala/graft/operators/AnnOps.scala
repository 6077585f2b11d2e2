package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.gf

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.E).
  *
  * Three tiers, in increasing scale-readiness:
  *   - E1 brute force: exact top-k; the QUERY side is the small one and
  *     is broadcast — the big corpus never shuffles or replicates. The
  *     correctness baseline (DuckDB-oracled).
  *   - E2 sign-LSH: candidates from (table_id, bucket) equi-joins over
  *     L hash tables; cost = linear bucketing + per-bucket verify.
  *   - E3 IVF: one aggregation pass builds cell centroids, vectors are
  *     assigned to nearest cell, queries probe the nprobe nearest
  *     cells — the classic inverted-file layout (cf. FAISS IVF design,
  *     Jégou et al., "Product Quantization for Nearest Neighbor
  *     Search").
  */
object AnnOps {

  /** Per-table sign-LSH bucket assignment: one row per (id, table). */
  def signBuckets(vecs: DataFrame, idCol: String,
      numTables: Int, bitsPerTable: Int, seedBase: Long = 7L): DataFrame = {
    val bucketCols = array((0 until numTables).map { t =>
      gf.sign_bits64(col("embedding"), bitsPerTable, seedBase + t * 1000L)
    }: _*)
    vecs.select(col(idCol), posexplode(bucketCols))
      .withColumnRenamed("pos", "table_id")
      .withColumnRenamed("col", "bucket")
  }

  // ---------------------------------------------------------------- E1
  /** Exact cosine top-k via broadcast of the query set. Deterministic:
    * similarity rounded to 6dp (bridges engine ulp differences) and
    * rank tie-broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val pairs = corpus
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(gf.cosine_sim(col("qv"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def annBruteforce(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    bruteForceTopK(emb, queries, 5)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  val annBruteforceSql: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id < 10),
      |pairs AS (
      |  SELECT qid, vec_id AS nid,
      |    round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS sim
      |  FROM q, embeddings WHERE vec_id <> qid)
      |SELECT qid, rank, nid, sim FROM (
      |  SELECT qid, nid, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
      |  FROM pairs) WHERE rank <= 5""".stripMargin

  // ---------------------------------------------------------------- E2
  /** Sign-LSH ANN: candidates share a bucket in ≥1 of L tables; exact
    * cosine re-rank within candidates. Identical vectors are always
    * candidates (same buckets under every seed). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numTables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val cb = signBuckets(corpus, "vec_id", numTables, bitsPerTable)
    val qb = signBuckets(
      queries.select(col("qid").as("vec_id"), col("qv").as("embedding")),
      "vec_id", numTables, bitsPerTable)
      .withColumnRenamed("vec_id", "qid")
    val candIds = qb.join(cb, Seq("table_id", "bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid")).distinct()
    val scored = candIds
      .join(corpus.select(col("vec_id").as("nid"), col("embedding")), "nid")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("nid"),
        round(gf.cosine_sim(col("qv"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    lshTopK(emb, queries, 5)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  // ---------------------------------------------------------------- E3
  /** IVF cells: centroid per `label` built in one aggregation pass
    * (at scale: a k-means iteration is exactly this agg repeated);
    * every vector assigned to its nearest centroid; queries probe the
    * `nprobe` nearest cells only. */
  def ivfCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("v"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v").cast("float")).as("centroid"))
      .select(col("label").as("cell"), col("centroid"))

  def ivfAssign(emb: DataFrame, cents: DataFrame): DataFrame = {
    // argmin via min_by aggregation (hash-agg, partial map-side) —
    // no per-vector sort; ties broken by cell id like the window form
    emb.crossJoin(broadcast(cents))
      .withColumn("dist", gf.l2_dist(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell"), col("embedding")),
        struct(col("dist"), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        col("best.embedding").as("embedding"))
  }

  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = ivfCentroids(emb).cache()
    val assigned = ivfAssign(emb, cents)
    val qw = Window.partitionBy(col("qid")).orderBy(col("qdist"), col("cell"))
    val probeCells = queries.crossJoin(broadcast(cents))
      .withColumn("qdist", gf.l2_dist(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(qw))
      .filter(col("qrn") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    val scored = probeCells.join(assigned, "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(gf.cosine_sim(col("qv"), col("embedding")), 6).as("sim"))
      .distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    ivfTopK(emb, queries, 5, nprobe = 3)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> annBruteforce _,
    "ann_lsh" -> annLsh _,
    "ann_ivf" -> annIvf _
  )

  def oracleSql: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql
    // ann_lsh / ann_ivf are approximate → rows-only driver check;
    // recall vs ann_bruteforce pinned in AnnSpec.
  )
}
