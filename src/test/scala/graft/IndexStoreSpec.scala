package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupMore, DedupOps}
import graft.sources.IndexStore

/** The segmented standing-index lifecycle (SURVEY §2.H): refresh
  * appends a segment without touching standing data, probes fan out
  * one join per segment with the index side Exchange-free, and
  * compaction merges the fan-out back to one — with result equality
  * pinned across refresh / compaction / full rebuild. */
class IndexStoreSpec extends SparkSuite {

  private def bands(df: DataFrame): DataFrame =
    DedupMore.bandKeys(DedupMore.bandSigs(df))

  test("refresh/compact/rebuild agree; probe shuffles only the batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idxstore").toString
    val all = DedupOps.corpus(Tables.documents(spark, sf))
      .withColumn("h", graft.functions.gf.h32($"doc_id".cast("string")) % 10)
    val day1 = all.filter($"h" <= 7).select("doc_id", "text")
    val day2 = all.filter($"h" === 8).select("doc_id", "text")
    val day3 = all.filter($"h" === 9).select("doc_id", "text")

    val store = new IndexStore(spark, "graft_t_idxstore", s"$dir/a", "bk")
    val rebuilt = new IndexStore(spark, "graft_t_idxrebuild", s"$dir/b", "bk")
    try {
      store.create(bands(day1).select($"bk", $"doc_id".as("id_old")))
      store.refresh(bands(day2).select($"bk", $"doc_id".as("id_old")))
      assert(store.segments == Seq(0, 1))

      val batch = bands(day3).select($"bk", $"doc_id".as("id_new"))
      def cands(s: IndexStore): DataFrame =
        s.probe(batch, _.select("id_new", "id_old")).distinct()
      def keys(df: DataFrame): Set[(Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // reference: one-segment store over day1+day2 (the full rebuild)
      rebuilt.create(bands(day1.unionByName(day2))
        .select($"bk", $"doc_id".as("id_old")))
      val expect = keys(cands(rebuilt))
      assert(expect.nonEmpty)
      assert(keys(cands(store)) == expect)

      // plan shape under forced SMJ: one join per segment; the index
      // side reads its bucketing, so the only shuffles are the batch
      // side's (one per segment — ReuseExchange may dedupe the scan,
      // but no Exchange may sit above a segment's bucketed scan)
      val abt = "spark.sql.autoBroadcastJoinThreshold"
      val prior = spark.conf.getOption(abt)
      spark.conf.set(abt, "-1")
      try {
        def shape(s: IndexStore): (Int, Int) = {
          val plan = s.probe(batch, _.select("id_new", "id_old"))
            .queryExecution.executedPlan.toString
          val joins = "SortMergeJoin".r.findAllMatchIn(plan).size
          val segScansUnderExchange =
            "Exchange[^\\n]*\\n[^\\n]*graft_t_idx".r.findAllMatchIn(plan).size
          (joins, segScansUnderExchange)
        }
        assert(shape(store) == (2, 0))
        store.compact()
        assert(store.segments.size == 1)
        assert(shape(store) == (1, 0))
      } finally prior.fold(spark.conf.unset(abt))(spark.conf.set(abt, _))

      // compaction preserved the result set
      assert(keys(cands(store)) == expect)
    } finally {
      store.drop(); rebuilt.drop()
    }
  }

  test("time travel: a retained snapshot's probe is isolated from later refreshes/compactions; vacuum fires only on expiry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idxtt").toString
    val all = DedupOps.corpus(Tables.documents(spark, sf))
      .withColumn("h", graft.functions.gf.h32($"doc_id".cast("string")) % 10)
    def slice(lo: Int, hi: Int): DataFrame =
      all.filter($"h" >= lo && $"h" <= hi).select("doc_id", "text")
    val store = new IndexStore(spark, "graft_t_idxtt", s"$dir/a", "bk",
      keepSnapshots = 2)
    try {
      val batch = bands(slice(9, 9)).select($"bk", $"doc_id".as("id_new"))
      def keysAsOf(v: Int): Set[(Long, Long)] =
        store.probeAsOf(v, batch, _.select("id_new", "id_old")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      store.create(bands(slice(0, 5)).select($"bk", $"doc_id".as("id_old")))
      val v1 = store.snapshots.last
      val at1 = keysAsOf(v1)
      assert(at1.nonEmpty)

      // refresh-isolation: the v1 view is bit-stable under a refresh
      store.refresh(bands(slice(6, 7)).select($"bk", $"doc_id".as("id_old")))
      val v2 = store.snapshots.last
      assert(v2 != v1)
      assert(keysAsOf(v1) == at1, "later refresh leaked into snapshot v1")
      val at2 = keysAsOf(v2)
      assert(at2.size > at1.size) // the refresh really added matches

      // compaction-isolation: keepSnapshots=2 retains v2 after compact;
      // its pre-compaction segments must survive vacuum and replay
      // bit-identically even though the LIVE manifest is one merged seg
      store.compact()
      val v3 = store.snapshots.last
      assert(store.segments.size == 1)
      assert(store.snapshots == Seq(v2, v3)) // v1 expired (retention 2)
      assert(keysAsOf(v2) == at2, "compaction changed the v2 snapshot view")
      assert(keysAsOf(v3) == at2, "compaction changed the probe result")
      // the expired v1 snapshot is gone, and reading it says so
      intercept[IllegalArgumentException](store.segmentsAsOf(v1))

      // expiry-driven vacuum: two more refreshes age v2 out — its
      // exclusive pre-compaction segments must then leave the disk
      store.refresh(bands(slice(8, 8)).select($"bk", $"doc_id".as("id_old")))
      store.refresh(bands(slice(6, 6)).select($"bk", $"doc_id".as("id_old")))
      assert(!store.snapshots.contains(v2))
      val liveDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/a"))
        .iterator()
      val segDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(liveDirs)
        .asScala.map(_.getFileName.toString).filter(_.startsWith("seg_")).toSet
      val reachable = store.snapshots.flatMap(store.segmentsAsOf).toSet
        .map((s: Int) => s"seg_$s")
      assert(segDirs == reachable,
        s"vacuum drift: on disk $segDirs vs reachable $reachable")
    } finally store.drop()
  }

  test("probeDelta: incremental consumption — probe(vTo) = probe(vFrom) ∪ delta for refresh histories; compaction delta is layout-only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idxdelta").toString
    val all = DedupOps.corpus(Tables.documents(spark, sf))
      .withColumn("h", graft.functions.gf.h32($"doc_id".cast("string")) % 10)
    def slice(lo: Int, hi: Int): DataFrame =
      all.filter($"h" >= lo && $"h" <= hi).select("doc_id", "text")
    val store = new IndexStore(spark, "graft_t_idxdelta", s"$dir/a", "bk",
      keepSnapshots = 4)
    try {
      val batch = bands(slice(9, 9)).select($"bk", $"doc_id".as("id_new"))
      def keys(df: DataFrame): Set[(Long, Long)] =
        df.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def probeAt(v: Int) = keys(
        store.probeAsOf(v, batch, _.select("id_new", "id_old")))

      store.create(bands(slice(0, 5)).select($"bk", $"doc_id".as("id_old")))
      val v1 = store.snapshots.last
      store.refresh(bands(slice(6, 7)).select($"bk", $"doc_id".as("id_old")))
      val v2 = store.snapshots.last
      store.refresh(bands(slice(8, 8)).select($"bk", $"doc_id".as("id_old")))
      val v3 = store.snapshots.last

      // incremental-consumer identity across one and two refreshes
      val d12 = keys(store.probeDelta(v1, v2, batch,
        _.select("id_new", "id_old")))
      val d13 = keys(store.probeDelta(v1, v3, batch,
        _.select("id_new", "id_old")))
      assert(d12.nonEmpty)
      assert((probeAt(v1) ++ d12) == probeAt(v2))
      assert((probeAt(v1) ++ d13) == probeAt(v3))

      // compaction is a layout rewrite, not new data: the delta list
      // is the merged segment (conservative re-read), and union with
      // the old view still reproduces the new view exactly
      store.compact()
      val v4 = store.snapshots.last
      val d34 = keys(store.probeDelta(v3, v4, batch,
        _.select("id_new", "id_old")))
      assert((probeAt(v3) ++ d34) == probeAt(v4))
      assert(probeAt(v4) == probeAt(v3)) // no new rows from a rewrite
    } finally store.drop()
  }

  test("refresh auto-compacts at the maxSegments bound, probe-result-neutral") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idxauto").toString
    val all = DedupOps.corpus(Tables.documents(spark, sf))
      .withColumn("h", graft.functions.gf.h32($"doc_id".cast("string")) % 10)
    def slice(lo: Int, hi: Int): DataFrame =
      all.filter($"h" >= lo && $"h" <= hi).select("doc_id", "text")

    // bound 3 = the CompactionProbe-style rule with a small n* so the
    // trigger is exercised twice in one test
    val auto = new IndexStore(spark, "graft_t_idxauto", s"$dir/a", "bk",
      maxSegments = 3)
    val manual = new IndexStore(spark, "graft_t_idxman", s"$dir/b", "bk")
    try {
      auto.create(bands(slice(0, 5)).select($"bk", $"doc_id".as("id_old")))
      manual.create(bands(slice(0, 5)).select($"bk", $"doc_id".as("id_old")))
      auto.refresh(bands(slice(6, 6)).select($"bk", $"doc_id".as("id_old")))
      manual.refresh(bands(slice(6, 6)).select($"bk", $"doc_id".as("id_old")))
      assert(auto.segments.size == 2) // below bound: plain append
      auto.refresh(bands(slice(7, 7)).select($"bk", $"doc_id".as("id_old")))
      manual.refresh(bands(slice(7, 7)).select($"bk", $"doc_id".as("id_old")))
      // third segment reached the bound → compaction fired inside refresh
      assert(auto.segments.size == 1,
        s"expected auto-compaction at 3 segments, got ${auto.segments}")
      auto.refresh(bands(slice(8, 8)).select($"bk", $"doc_id".as("id_old")))
      manual.refresh(bands(slice(8, 8)).select($"bk", $"doc_id".as("id_old")))
      assert(auto.segments.size == 2) // counter restarted post-compaction

      val batch = bands(slice(9, 9)).select($"bk", $"doc_id".as("id_new"))
      def keys(s: IndexStore): Set[(Long, Long)] =
        s.probe(batch, _.select("id_new", "id_old")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = keys(manual)
      assert(expect.nonEmpty)
      assert(keys(auto) == expect,
        "auto-compaction changed the probe result")
    } finally {
      auto.drop(); manual.drop()
    }
  }
}
