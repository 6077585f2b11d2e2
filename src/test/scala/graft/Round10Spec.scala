package graft

import org.apache.spark.sql.functions._

import graft.operators.RetrievalOps

/** Round-10 operator specs (SURVEY §2 rows landed this round). */
class Round10Spec extends SparkSuite {

  test("bm25_standing: result equals the rebuild-from-text C17 and the index side probes Exchange-free") {
    // running the query builds the two standing stores (2 segments each)
    val standing = RetrievalOps.bm25Standing(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val rebuilt = RetrievalOps.textBm25(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(standing.nonEmpty)
    assert(standing == rebuilt, "standing index diverged from rebuild")

    val (post, dls) = RetrievalOps.bm25Stores(spark, sf)
    assert(post.segments.size == 2, s"expected 2 posting segments")
    assert(dls.segments.size == 2)

    // Exchange-free index side: under forced SMJ, no Exchange may sit
    // directly above a posting-segment bucketed scan in the probe plan
    val abt = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.getOption(abt)
    spark.conf.set(abt, "-1")
    try {
      val probe = post.probe(
        RetrievalOps.bm25ProbeTerms(spark).select(col("tok")).distinct(),
        _.select(col("tok"), col("doc_id"), col("c")))
      val plan = probe.queryExecution.executedPlan.toString
      val indexSideExchanges =
        "Exchange[^\\n]*\\n[^\\n]*graft_bm25_post".r.findAllMatchIn(plan).size
      assert(indexSideExchanges == 0,
        s"index side shuffled:\n$plan")
    } finally prior.fold(spark.conf.unset(abt))(spark.conf.set(abt, _))
  }
}
