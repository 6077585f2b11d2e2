package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CacheHygiene, SparkEntry, Tables}

/** Bench-variance diagnostic (round 12, closes the round-10 #2 /
  * round-11 #5 "find the mechanism" task): times one query's steady
  * state repeatedly in a SINGLE JVM, before and after the run-shared
  * substrate builds (BM25/phrase IndexStore segments, the BPE
  * trajectory, the kNN graph), with per-rep JVM GC time — the A/B
  * the judge asked for ("suspect: per-run temp-store parquet writes
  * shifting page-cache pressure; A/B with stores pre-built").
  *
  * Reading the output: if post-build times exceed pre-build times
  * beyond the rep-to-rep spread, the store writes ARE the mechanism;
  * if the spread within each phase swallows the phase delta, the
  * swings are ambient JVM state (JIT/GC/page cache) and the honest
  * policy is a noise band, not a per-query diagnosis. GC deltas per
  * rep separate heap pressure from everything else.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.VarianceProbe text_nb_classify"
  */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("text_nb_classify")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
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
    val fn = SparkEntry.queries(name)

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def timedReps(n: Int): Seq[(Double, Long)] = (1 to n).map { _ =>
      CacheHygiene.release(spark, blocking = true)
      val g0 = gcMillis
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, gcMillis - g0)
    }

    // warmup: tables, shuffle codegen, and THE query's own plan JIT —
    // so rep 1 measures steady state, not compilation
    Seq(Tables.lineitem _, Tables.orders _, Tables.documents _,
      Tables.events _, Tables.embeddings _)
      .foreach(t => t(spark, sfDir).count())
    fn(spark, sfDir).count()

    val pre = timedReps(reps)
    // the substrate builds the full bench pays between queries
    graft.operators.RetrievalOps.bm25StandingBuild(spark, sfDir)
    graft.operators.Round10bOps.phraseStandingBuild(spark, sfDir)
    graft.operators.Round10Ops.bpeShared(spark, sfDir)
    SparkEntry.queries("knn_graph")(spark, sfDir).count()
    SparkEntry.queries("dedup_containment")(spark, sfDir).count()
    val post = timedReps(reps)

    def fmt(rs: Seq[(Double, Long)]): String = rs.map { case (t, g) =>
      f"""{"sec":$t%.3f,"gc_ms":$g}"""
    }.mkString("[", ",", "]")
    println(s"""{"query":"$name","sf":"$sfDir","pre_build":${fmt(pre)},"post_build":${fmt(post)}}""")
    spark.stop()
  }
}
