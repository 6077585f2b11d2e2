package graft

import org.apache.spark.sql.SparkSession

/** Cache/persist lifecycle policy for long-lived sessions.
  *
  * Several operators persist() small derived relations that feed
  * multiple consumers (LSH band relations, vocab-sized marginals,
  * distinct (user,type) pairs — see SURVEY.md §5 "diamond plans"), and
  * the iterative connected-components rounds truncate lineage with
  * localCheckpoint, which pins RDD blocks. Both are deliberately left
  * alive when the operator returns: the returned DataFrame is LAZY, so
  * the persisted subtree is still referenced by the plan the caller is
  * about to execute — unpersisting on the return path would re-execute
  * the whole upstream once per consumer, defeating the persist.
  *
  * The contract is therefore session-scoped: after CONSUMING a query's
  * result (action completed), call [[CacheHygiene.release]] to drop
  * everything the query pinned. Verify and Bench do this between
  * queries; a composing application does it at its own checkpoint
  * boundaries. Asserted by HygieneSpec: a persist-heavy query leaves
  * zero persistent RDDs after release().
  */
object CacheHygiene {

  /** Drop every cached relation the session holds: cached tables /
    * persisted DataFrames (CacheManager) AND raw persisted RDD blocks
    * (localCheckpoint's — clearCache alone does NOT free those; round
    * 6's bench recorded a 12× inflated q4 from exactly that leak). */
  def release(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))
  }
}
