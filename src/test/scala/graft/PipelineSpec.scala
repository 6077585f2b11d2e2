package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, PipelineOps}
import graft.streaming.StreamingTwins

/** Dataset-assembly operators (SURVEY.md §2.J) and the streaming
  * oracle twins (§2.G): property checks the DuckDB hash compare can't
  * express (fraction bounds, budget invariants, batch/stream parity). */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("sample_split: exhaustive, disjoint, roughly 90/5/5") {
    val split = PipelineOps.sampleSplit(spark, sf).cache()
    val n = split.count()
    assert(n == Tables.documents(spark, sf).count())
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / n
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train frac $trainFrac")
    // deterministic: same membership on recompute
    assert(PipelineOps.sampleSplit(spark, sf).except(split).count() == 0)
    split.unpersist()
  }

  test("sample_stratified: exactly ceil(20%) of every source") {
    val sizes = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = PipelineOps.sampleStratified(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == sizes.keySet)
    kept.foreach { case (src, k) =>
      assert(k == (sizes(src) + 4) / 5, s"source $src: kept $k of ${sizes(src)}")
    }
  }

  test("pack_sequences: offsets contiguous per source, chunk = offset/512") {
    val rows = PipelineOps.packSequences(spark, sf)
      .orderBy("source", "doc_id").collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      var expectOff = 0L
      rs.foreach { r =>
        assert(r.getAs[Long]("tok_offset") == expectOff)
        assert(r.getAs[Long]("chunk_id") == expectOff / 512)
        expectOff += r.getAs[Long]("n_tok")
      }
    }
  }

  test("contamination_check: overlap bounded by doc shingle count, no bench-bench pairs") {
    val rows = PipelineOps.contamination(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 0)
      assert(r.getAs[Long]("bench_id") % 50 == 0)
      assert(r.getAs[Long]("n_overlap") >= 2)
      val frac = r.getAs[Double]("contam_frac")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("emb_quantize: q8 values within int8 range, norm positive") {
    val rows = PipelineOps.embQuantize(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("l2_norm") > 0)
      val qs = r.getAs[String]("q8").split(",").map(_.toInt)
      assert(qs.length == 64)
      assert(qs.forall(q => q >= -128 && q <= 127))
    }
  }

  test("emb_kmeans: total partition, seeded clusters, deterministic") {
    import graft.operators.AnnOps
    val km = AnnOps.embKmeans(spark, sf).cache()
    assert(km.count() == Tables.embeddings(spark, sf).count())
    assert(km.select("vec_id").distinct().count() == km.count())
    val clusters = km.select("cluster").distinct().collect().map(_.getLong(0))
    assert(clusters.forall(c => c >= 0 && c <= 9)) // label-seeded ids
    assert(km.agg(min($"d2")).collect().head.getLong(0) >= 0)
    assert(AnnOps.embKmeans(spark, sf).except(km).count() == 0)
    km.unpersist()
  }

  test("text_chunks: windows cover every token with stride 96") {
    import graft.operators.TextOps
    TextOps.textChunks(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
        val n = rs.head.getAs[Long]("n_tok")
        val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
        assert(sorted.head.getAs[Long]("start_tok") == 0)
        assert(sorted.last.getAs[Long]("end_tok") == n)
        sorted.sliding(2).foreach {
          case Array(a, b) => // consecutive windows overlap by 32 tokens
            assert(b.getAs[Long]("start_tok") ==
              a.getAs[Long]("start_tok") + 96)
            assert(b.getAs[Long]("start_tok") < a.getAs[Long]("end_tok"))
          case _ =>
        }
      }
  }

  test("q_events_funnel: step timestamps strictly ordered, depth consistent") {
    import graft.operators.ExtendedAnalytics
    val rows = ExtendedAnalytics.qEventsFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("funnel_depth") == 3L), "no full conversions")
    rows.foreach { r =>
      val (t1, t2, t3) = (r.getAs[java.time.LocalDateTime]("t1"),
        r.getAs[java.time.LocalDateTime]("t2"),
        r.getAs[java.time.LocalDateTime]("t3"))
      val depth = r.getAs[Long]("funnel_depth")
      assert(t1 != null)
      assert((t2 != null) == (depth >= 2) || (t2 != null && depth == 3))
      assert((t3 != null) == (depth == 3))
      if (t2 != null) assert(t1.isBefore(t2))
      if (t3 != null) assert(t2.isBefore(t3))
    }
  }

  test("text_quality_gate: flag agrees with the recomputed signal conjunction") {
    import graft.operators.TextOps
    val rows = TextOps.textQualityGate(spark, sf).collect()
    val passes = rows.count(_.getAs[String]("pass_flag") == "Y")
    assert(passes > 0 && passes < rows.length, s"degenerate gate: $passes/${rows.length}")
    rows.foreach { r =>
      val expected = r.getAs[Double]("quality_score") >= 0.72 &&
        r.getAs[Double]("token_entropy") >= 4.0 &&
        !r.isNullAt(r.fieldIndex("lm_score")) &&
        r.getAs[Double]("lm_score") >= -3.42
      assert((r.getAs[String]("pass_flag") == "Y") == expected)
    }
  }

  test("top_k aggregate equals the window top-k and is partitioning-independent") {
    import graft.operators.ExtendedAnalytics
    import graft.functions.TopKAgg
    val agg = ExtendedAnalytics.qTopkAgg(spark, sf).cache()
    val win = Analytics.qTopkPerGroup(spark, sf)
      .select($"p_brand", $"price_rank".cast("long").as("price_rank"),
        $"p_partkey", $"p_retailprice")
    assert(agg.except(win).count() == 0)
    assert(win.except(agg).count() == 0)
    // merge-order independence: a hostile repartitioning gives the same rows
    val repart = Tables.part(spark, sf).repartition(7)
      .groupBy($"p_brand")
      .agg(TopKAgg.top_k($"p_retailprice", $"p_partkey", 3).as("top"))
      .select($"p_brand", posexplode($"top"))
      .select($"p_brand", ($"pos" + 1).cast("long").as("price_rank"),
        $"col.id".as("p_partkey"), $"col.v".as("p_retailprice"))
    assert(repart.except(agg).count() == 0)
    assert(agg.except(repart).count() == 0)
    agg.unpersist()
  }

  test("streaming twins equal their batch counterparts") {
    // window counts: batch twin minus the streaming-forbidden countDistinct
    val batchW = Analytics.qEventsWindow(spark, sf)
      .select($"hour", $"event_type", $"n_events", $"total_value")
    val streamW = StreamingTwins.streamingWindowCounts(spark, sf)
    assert(streamW.except(batchW).count() == 0)
    assert(batchW.except(streamW).count() == 0)
    // sessionize: compare against an inline batch recomputation using
    // the STREAMING operator's gap semantics (epoch-ms diffs > 30 min).
    // Analytics.qEventsSessionize floors to SECONDS (unix_timestamp), so
    // a gap landing in (1800 s, 1801 s) would legitimately split
    // differently there — that's a unit difference, not a parity bug.
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batchS = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id")
      .withColumn("ms", expr("unix_micros(ts) DIV 1000"))
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("is_new", when($"prev_ms".isNull ||
        $"ms" - $"prev_ms" > 1800000L, 1L).otherwise(0L))
      .withColumn("seq", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"seq").agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
        sum($"n").as("n_events"))
    val streamS = StreamingTwins.streamingSessionize(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"))
    assert(streamS.except(batchS).count() == 0)
    assert(batchS.except(streamS).count() == 0)
  }
}
