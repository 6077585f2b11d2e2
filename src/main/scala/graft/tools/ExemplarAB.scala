package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CacheHygiene, SparkEntry, Tables}

/** Per-commit timing instrumentation for the OPEN
  * `ann_layered_incremental` watch (r17 verdict item #3, second
  * strike on a change-adjacent row): the only r17 code on that row's
  * path is the exemplar-selection edit (global rank window → scan-side
  * hash threshold + exact trim, Round16Ops.exemplars). This tool
  * times the SAME query in ONE JVM under both exemplar forms
  * (`graft.exemplars.ab` system property — "threshold" is the shipped
  * path, "window" the pre-r17 form; the selected SET is spec-pinned
  * identical, so any timing delta is pure plan cost), interleaved
  * A/B/A/B so ambient drift hits both arms equally. If the threshold
  * arm is consistently slower the edit owns the watch (name the term:
  * the crossJoin(nstats) broadcast + the survivor-count window);
  * otherwise the edit is exonerated and the watch closes on the
  * committed bench read.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ExemplarAB ann_layered_incremental 5"
  */
object ExemplarAB {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_layered_incremental")
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

    // warmup: tables + BOTH plan shapes' codegen
    Seq(Tables.lineitem _, Tables.embeddings _)
      .foreach(t => t(spark, sfDir).count())
    Seq("threshold", "window").foreach { form =>
      sys.props("graft.exemplars.ab") = form
      fn(spark, sfDir).count()
    }

    def rep(form: String): Double = {
      sys.props("graft.exemplars.ab") = form
      CacheHygiene.release(spark, blocking = true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // interleaved so ambient drift lands on both arms; the property
    // is removed in finally — a leaked "window" setting would silently
    // revert every later exemplar build in this JVM to the corpus-wide
    // single-task window plan (identical results, O(N) single-task
    // sort), which no oracle would ever flag (r18 review)
    val out =
      try (1 to reps).map(_ => (rep("threshold"), rep("window")))
      finally sys.props.remove("graft.exemplars.ab")
    println(s"""{"query":"$name","sf":"$sfDir","reps":[""" +
      out.map { case (t, w) =>
        f"""{"threshold":$t%.3f,"window":$w%.3f}""" }.mkString(",") +
      s"""],"floor_threshold":${f"${out.map(_._1).min}%.3f"}""" +
      s""","floor_window":${f"${out.map(_._2).min}%.3f"}}""")
    spark.stop()
  }
}
