package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.{CacheHygiene, SparkEntry, Tables}
import graft.streaming.StreamingTwins

/** Per-commit instrumentation for the OPEN `streaming_ivm` watch —
  * the escalation the r17 re-base armed and the r18 strike fired
  * (committed 6.08 and a driver read 7.63 vs the [4.3, 4.4] band;
  * r16's code A/B already exonerated the memo-key edit, so what the
  * ledger owes is a NAMED TERM for the level shift).
  *
  * In ONE JVM (the ExemplarAB discipline — ambient drift hits both
  * arms equally) this interleaves A/B/A/B:
  *   A = `streaming_ivm` via the phased hook: every serial leg timed
  *       (staging / seed_create / seed_total_read / stream_wall with
  *       commit_stage+commit_audit+commit_publish inside /
  *       final_read), so the level shift decomposes into named terms
  *       instead of one opaque total;
  *   B = `streaming_ivm_distinct`, the sibling twin that shares every
  *       byte of the WAP/SnapshotTable machinery and commits MORE
  *       batches — the control that separates machinery drift (both
  *       twins move) from a streaming_ivm-local mechanism (only A
  *       moves).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.IvmPhaseProbe 10"
  */
object IvmPhaseProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
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

    // warmup: tables + one full pass of each arm (pays the memoized
    // delta staging and both twins' codegen)
    Tables.orders(spark, sfDir).count()
    StreamingTwins.streamingIvm(spark, sfDir).count()
    SparkEntry.queries("streaming_ivm_distinct")(spark, sfDir).count()

    def repA(): (Double, Map[String, Double]) = {
      val acc = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      CacheHygiene.release(spark, blocking = true)
      val t0 = System.nanoTime()
      val df = StreamingTwins.streamingIvmPhased(spark, sfDir,
        (name, sec) => acc(name) += sec)
      val tRead0 = System.nanoTime()
      df.count()
      acc("final_read") += (System.nanoTime() - tRead0) / 1e9
      ((System.nanoTime() - t0) / 1e9, acc.toMap)
    }
    def repB(): Double = {
      CacheHygiene.release(spark, blocking = true)
      val t0 = System.nanoTime()
      SparkEntry.queries("streaming_ivm_distinct")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val out = (1 to reps).map { _ => (repA(), repB()) }
    val phaseKeys = out.flatMap(_._1._2.keys).distinct.sorted
    def fm(d: Double) = f"$d%.3f"
    println("""{"probe":"ivm_phase","sf":"""" + sfDir +
      """","reps":[""" +
      out.map { case ((ta, ph), tb) =>
        s"""{"ivm_total":${fm(ta)},"distinct_total":${fm(tb)},""" +
          phaseKeys.map(k => s""""$k":${fm(ph.getOrElse(k, 0.0))}""")
            .mkString(",") + "}"
      }.mkString(",") +
      s"""],"floor_ivm":${fm(out.map(_._1._1).min)}""" +
      s""","floor_distinct":${fm(out.map(_._2).min)}""" +
      s""","phase_floors":{""" +
      phaseKeys.map(k => s""""$k":${fm(out.map(_._1._2.getOrElse(k, 0.0)).min)}""")
        .mkString(",") + "}}")
    spark.stop()
  }
}
