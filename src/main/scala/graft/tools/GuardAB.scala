package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CacheHygiene, SparkEntry, Tables}

/** Per-commit A/B for the OPEN layered-family watches (r18 verdict
  * item #4): the three change-adjacent rows (ann_graph_layered,
  * ann_layered_cap_incremental, ann_layered_incremental) carry a
  * named ~0.3 s guard premium from the r18 starved-trim sentinel; if
  * a committed draw reads above floor + 0.3 + band, the sentinel-row
  * union (Round16Ops.exemplars) is the suspect. This times the SAME
  * query in ONE JVM with the guard ON (shipped path) vs OFF
  * (`graft.exemplars.guard=off` — threshold + exact trim only; the
  * selected SET is identical whenever the guard would not have
  * fired), interleaved A/B/A/B so ambient drift hits both arms
  * equally. A consistent gap ⇒ the guard owns the watch (name the
  * term: sentinel union + the survivor-count window); no gap ⇒ the
  * guard is exonerated and the watch dispositions as ambient.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.GuardAB ann_layered_incremental 10"
  */
object GuardAB {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_layered_incremental")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
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
    Seq("on", "off").foreach { form =>
      sys.props("graft.exemplars.guard") = form
      fn(spark, sfDir).count()
    }

    def rep(form: String): Double = {
      sys.props("graft.exemplars.guard") = form
      CacheHygiene.release(spark, blocking = true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // property removed in finally: a leaked "off" would silently ship
    // the guard-less exemplar build to every later query in this JVM
    val out =
      try (1 to reps).map(_ => (rep("on"), rep("off")))
      finally sys.props.remove("graft.exemplars.guard")
    println(s"""{"query":"$name","sf":"$sfDir","reps":[""" +
      out.map { case (a, b) =>
        f"""{"guard_on":$a%.3f,"guard_off":$b%.3f}""" }.mkString(",") +
      s"""],"floor_on":${f"${out.map(_._1).min}%.3f"}""" +
      s""","floor_off":${f"${out.map(_._2).min}%.3f"}}""")
    spark.stop()
  }
}
