package graft.tools

import org.apache.spark.sql.SparkSession

import graft.CacheHygiene

/** VarianceProbe's discipline for the `_build` bench rows: run a
  * named store build N times, each under a FRESH store root (so every
  * rep is a genuine cold build, the Bench A/B semantics), print
  * per-rep seconds + GC time. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BuildProbe gbt_model_build 3"
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("gbt_model_build")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val builds: Map[String, () => Unit] = Map(
      "gbt_model_build" ->
        (() => graft.operators.ModelStore.gbtModelBuild(spark, sfDir)),
      "forest_model_build" ->
        (() => graft.operators.ModelStore.forestModelBuild(spark, sfDir)),
      "forest_cv_build" ->
        (() => graft.operators.ModelStore.forestProtocolsBuild(spark, sfDir)),
      "ivm_state_build" ->
        (() => graft.operators.Round12Ops.IvmStateStore.build(spark, sfDir)),
      // round 18 (r17 judge item #2a): the remaining `_build` rows,
      // so an out-of-band build floor can get a cold-rep cycle
      "dedup_index_build" ->
        (() => graft.operators.DedupOps.dedupIndexBuild(spark, sfDir)),
      "bm25_standing_build" ->
        (() => graft.operators.RetrievalOps.bm25StandingBuild(spark, sfDir)),
      "phrase_standing_build" ->
        (() => graft.operators.Round10bOps.phraseStandingBuild(spark, sfDir)),
      "knn_graph_pre_build" ->
        (() => graft.operators.AnnOps.knnGraphPreBuild(spark, sfDir)),
      "cknn_graph_pre_build" ->
        (() => graft.operators.Round16Ops.cknnGraphPreBuild(spark, sfDir)),
      "ccap_graph_pre_build" ->
        (() => graft.operators.Round17Ops.ccapGraphPreBuild(spark, sfDir)))
    val fn = builds(name)
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // warmup: tables + one non-timed query so session costs are paid
    graft.Tables.lineitem(spark, sfDir).count()
    val out = (1 to reps).map { _ =>
      val fresh = java.nio.file.Files
        .createTempDirectory("graft_buildprobe").toString
      spark.conf.set(graft.sources.StoreRoot.confKey, fresh)
      graft.operators.ModelStore.forgetBuiltForTests()
      CacheHygiene.release(spark, blocking = true)
      val g0 = gcMillis
      val t0 = System.nanoTime()
      fn()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.sources.StoreRoot.deleteRecursively(
        java.nio.file.Paths.get(fresh))
      (sec, gcMillis - g0)
    }
    spark.conf.unset(graft.sources.StoreRoot.confKey)
    println(s"""{"build":"$name","sf":"$sfDir","reps":[""" +
      out.map { case (s, g) => f"""{"sec":$s%.3f,"gc_ms":$g}""" }
        .mkString(",") + "]}")
    spark.stop()
  }
}
