package graft

import org.apache.spark.sql.functions._

/** Pins the session cache policy (CacheHygiene): persist-heavy
  * operators may pin relations while their lazy result is being
  * consumed, but one release() call after the consuming action must
  * return the session to zero persisted state — so a long-lived
  * session composing operators can't accumulate cache until LRU
  * pressure. */
class HygieneSpec extends SparkSuite {

  test("release() drops all persistent RDDs pinned by persist-heavy queries") {
    // representatives of each pinning mechanism:
    //  - dedup_clusters: localCheckpoint per CC round (raw RDD blocks,
    //    NOT freed by clearCache)
    //  - text_pmi: operator-internal DataFrame persist()s
    //  - event_cooccurrence: persisted distinct (user,type) relation
    //  - round-7 persist sites: KMV sketch relation, PQ sub-vectors,
    //    perceptual-hash band relation
    Seq("dedup_clusters", "text_pmi", "event_cooccurrence",
      "sketch_kmv_setops", "ann_pq", "mm_phash_dedup").foreach { q =>
      SparkEntry.queries(q)(spark, sf).count()
    }
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the queries above to pin relations while consumed")
    CacheHygiene.release(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked after release: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
}
