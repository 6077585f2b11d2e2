package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{StatsOps, TpchFinal}

/** Semantic invariants for the round-6 batch-2 operators (the DuckDB
  * hash oracles pin exact values; these pin the properties that must
  * survive any refactor). */
class Round6Spec extends AnyFunSuite {

  private val spark = SparkSuite.session
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("q_outliers_zscore flags exactly the |z|>2 rows vs built-in stddev") {
    val ours = StatsOps.qOutliersZscore(spark, sf)
    // independent recompute with Spark's own stddev_samp/avg
    val stats = Tables.events(spark, sf).groupBy($"event_type")
      .agg(avg($"value").as("m"), stddev_samp($"value").as("s"))
    val ref = Tables.events(spark, sf)
      .join(stats, "event_type")
      .filter(abs(($"value" - $"m") / $"s") > 2.0)
    assert(ours.count() == ref.count())
    val z = ours.agg(min(abs($"zscore"))).as[Double].head()
    assert(z > 2.0)
  }

  test("event_transitions probabilities sum to 1 per from_event; steps conserve") {
    val out = StatsOps.eventTransitions(spark, sf).cache()
    val sums = out.groupBy($"from_event").agg(sum($"prob").as("p"))
      .as[(String, Double)].collect()
    for ((k, p) <- sums)
      assert(math.abs(p - 1.0) < 1e-4, s"probs for $k sum to $p")
    // total steps = events - users-with-events (each user contributes n-1)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(out.agg(sum($"n")).as[Long].head() == expected)
    out.unpersist()
  }

  test("text_pmi agrees with a hand-computed PMI on its top row") {
    val top = StatsOps.textPmi(spark, sf).head()
    val bigram = top.getString(0)
    val Array(w1, w2) = bigram.split(" ", 2)
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(explode(split(trim($"text"), "\\s+")).as("t")).cache()
    val nu = toks.count().toDouble
    val c1 = toks.filter($"t" === w1).count().toDouble
    val c2 = toks.filter($"t" === w2).count().toDouble
    val bgs = docs.select(explode(zip_with(
      slice(split(trim($"text"), "\\s+"), lit(1), greatest(size(split(trim($"text"), "\\s+")) - 1, lit(0))),
      slice(split(trim($"text"), "\\s+"), lit(2), greatest(size(split(trim($"text"), "\\s+")) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))).as("bg")).cache()
    val nb = bgs.count().toDouble
    val nxy = bgs.filter($"bg" === bigram).count().toDouble
    val want = math.log((nxy / nb) / ((c1 / nu) * (c2 / nu)))
    assert(math.abs(top.getDouble(2) - want) < 1e-5)
    assert(top.getLong(1) >= 5)
    toks.unpersist(); bgs.unpersist()
  }

  test("sketch_heavy_hitters never underestimates (est >= exact)") {
    val rows = StatsOps.sketchHeavyHitters(spark, sf)
      .as[(Long, Long, Long)].collect()
    val nUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    for ((_, est, exact) <- rows) assert(est >= exact)
    // sketch must stay fixed-size: estimates are the min over 4 rows of
    // a 128-cell table, so every est is bounded by the total event count
    val n = Tables.events(spark, sf).count()
    for ((_, est, _) <- rows) assert(est <= n)
  }

  test("streaming_cms state is the fixed-size sketch, equal to the batch cells") {
    val streamed = graft.streaming.StreamingTwins.streamingCms(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // bounded by D*W regardless of input size
    assert(streamed.size <= 4 * 32)
    val batch = Tables.events(spark, sf)
      .select(explode(graft.operators.StatsOps.cmsCellArray($"user_id")).as("hb"))
      .groupBy($"hb.h", $"hb.bucket").agg(count(lit(1)))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("q2_min_cost_supplier rows carry the per-part minimum cost") {
    val out = TpchFinal.q2MinCostSupplier(spark, sf).cache()
    // within the result, every (part, cost) pair must equal the min
    // cost listed for that part (no dominated offer survives)
    val bad = out.groupBy($"p_partkey")
      .agg(min($"cost").as("lo"), max($"cost").as("hi"))
      .filter($"lo" =!= $"hi")
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("q11_important_parts all exceed 1.5x the mean share") {
    val out = TpchFinal.q11ImportantParts(spark, sf).cache()
    assert(out.count() > 0)
    // share > 1.5 / n_parts-of-the-FULL-relation is not recoverable
    // from the output alone; check monotone ordering + share sanity
    val shares = out.select($"share").as[Double].collect()
    assert(shares.forall(s => s > 0 && s < 1))
    val vals = out.select($"value").as[Double].collect()
    assert(vals.sameElements(vals.sortBy(-_)))
    out.unpersist()
  }

  test("q16_supplier_count excludes low-balance suppliers") {
    val out = TpchFinal.q16SupplierCount(spark, sf)
    assert(out.agg(min($"supplier_cnt")).as[Long].head() >= 1)
    // recompute one bucket by hand including the exclusion
    val pairs = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey").distinct()
    val okSupp = Tables.supplier(spark, sf).filter($"s_acctbal" >= 1000)
      .select($"s_suppkey")
    val parts = Tables.part(spark, sf)
      .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO"
        && $"p_size".isin(5, 10, 15, 20))
    val want = pairs.join(okSupp, $"l_suppkey" === $"s_suppkey")
      .join(parts, $"l_partkey" === $"p_partkey")
      .select($"l_suppkey").distinct().count()
    val got = out.agg(sum($"supplier_cnt")).as[Long].head()
    assert(got >= want) // suppliers may count in several buckets
  }

  test("q_mad_outliers is threshold-consistent and a subset-sane scan") {
    val out = StatsOps.qMadOutliers(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.agg(min(abs($"robust_z"))).as[Double].head() > 2.0)
    // robust and classical scans must agree on the extreme tail: every
    // |z| > 4 classical outlier is also a robust outlier here
    val extreme = StatsOps.qOutliersZscore(spark, sf)
      .filter(abs($"zscore") > 4.0).select($"event_id")
    val missed = extreme.join(out, Seq("event_id"), "left_anti").count()
    assert(missed == 0)
    out.unpersist()
  }

  test("event_cooccurrence counts match an independent recompute") {
    val out = StatsOps.eventCooccurrence(spark, sf).cache()
    // pick the top pair, recompute its user count directly
    val top = out.head()
    val (a, b) = (top.getString(0), top.getString(1))
    val ev = Tables.events(spark, sf)
    val ua = ev.filter($"event_type" === a).select($"user_id").distinct()
    val ub = ev.filter($"event_type" === b).select($"user_id").distinct()
    assert(top.getLong(2) == ua.join(ub, "user_id").count())
    // support/lift sanity: support in (0,1]; pairs are strictly ordered
    val rows = out.select($"type_a", $"type_b", $"support").collect()
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1)
    }
    out.unpersist()
  }

  test("dedup_graph_degree conserves the handshake sum (Σ degree·n = 2·|pairs|)") {
    val corpus = graft.operators.DedupOps.corpus(Tables.documents(spark, sf))
    val nPairs = graft.operators.DedupOps.minhashPipeline(corpus, 0.5).count()
    val prof = graft.operators.DedupMore.dedupGraphDegree(spark, sf)
    val hand = prof.agg(sum($"degree" * $"n_docs")).as[Long].head()
    assert(hand == 2 * nPairs)
    assert(nPairs > 0) // planted near-dups must produce edges
  }

  test("sketch_log_histogram brackets the exact median in its median bucket") {
    val out = graft.operators.StatsOps.sketchLogHistogram(spark, sf).cache()
    // exactly one median bucket per group; ≤64 buckets per group
    val perGroup = out.groupBy($"event_type")
      .agg(sum(when($"is_median_bucket" === "Y", 1).otherwise(0)).as("ny"),
        count(lit(1)).as("nb"))
      .as[(String, Long, Long)].collect()
    for ((t, ny, nb) <- perGroup) {
      assert(ny == 1, s"$t has $ny median buckets"); assert(nb <= 64)
    }
    // the exact median must fall in [bucket_lo, 2*bucket_lo) of the
    // flagged bucket (for positive-value buckets)
    val med = Tables.events(spark, sf).groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    val flagged = out.filter($"is_median_bucket" === "Y" && $"bucket" >= 0)
      .select($"event_type", $"bucket_lo").as[(String, Double)].collect()
    for ((t, lo) <- flagged)
      assert(med(t) >= lo * 0.99 && med(t) < lo * 2 * 1.01,
        s"$t median ${med(t)} outside [$lo, ${lo * 2})")
    out.unpersist()
  }

  test("q_linreg matches Spark's built-in regr_slope/regr_r2 to 1e-6") {
    val ours = graft.operators.RelationalMore.qLinreg(spark, sf)
      .select($"l_returnflag", $"slope", $"r2")
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ref = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(regr_slope($"l_extendedprice", $"l_quantity").as("s"),
        regr_r2($"l_extendedprice", $"l_quantity").as("r"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for ((flag, (s, r)) <- ours) {
      assert(math.abs(s - ref(flag)._1) < 1e-6, s"slope mismatch for $flag")
      assert(math.abs(r - ref(flag)._2) < 1e-6, s"r2 mismatch for $flag")
    }
  }

  test("source_overlap is a valid half-matrix of Jaccards") {
    val out = graft.operators.DedupMore.sourceOverlap(spark, sf).cache()
    val nSources = Tables.documents(spark, sf)
      .select($"source").distinct().count()
    assert(out.count() <= nSources * (nSources - 1) / 2)
    val rows = out.select($"sa", $"sb", $"jaccard")
      .as[(String, String, Double)].collect()
    for ((sa, sb, j) <- rows) {
      assert(sa < sb)
      assert(j > 0 && j <= 1)
    }
    out.unpersist()
  }

  test("sample_weighted keep rate rises with doc length and is reproducible") {
    val out = graft.operators.PipelineOps.sampleWeighted(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    // short docs keep ~ their ppm weight; long docs keep more often
    val keptLong = out.filter($"n_chars" >= 500).count().toDouble /
      math.max(1, docs.filter($"n_chars" >= 500).count())
    val keptShort = out.filter($"n_chars" < 200).count().toDouble /
      math.max(1, docs.filter($"n_chars" < 200).count())
    assert(keptLong > keptShort)
    // deterministic: a second run selects the identical doc set
    val again = graft.operators.PipelineOps.sampleWeighted(spark, sf)
    assert(out.select($"doc_id").except(again.select($"doc_id")).count() == 0)
    assert(again.select($"doc_id").except(out.select($"doc_id")).count() == 0)
    out.unpersist()
  }

  test("q20_promo_suppliers satisfies the 20% threshold exactly") {
    val rows = TpchFinal.q20PromoSuppliers(spark, sf)
      .select($"qty_1997", $"qty_total").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((q97, tot) <- rows) assert(q97 * 5 > tot)
  }
}
