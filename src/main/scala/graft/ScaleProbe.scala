package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe: runs headline operators on 1× and 5×
  * replicas of the sf tables (ids offset per replica so keys stay
  * distinct) and reports the runtime ratio. A scalable plan should
  * grow ≈linearly (ratio ≈ 5, usually less thanks to fixed overhead);
  * a quadratic one explodes. Usage: runMain graft.ScaleProbe [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, times: Int, idCols: Seq[String], offset: Long): DataFrame =
      (0 until times).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * offset)))
      }.reduce(_ unionByName _)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // warmup
    li.count(); docs.count()

    val results = Seq(
      "q1_agg" -> {
        def run(d: DataFrame) = time(d.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("decimal(12,2)")), count(lit(1))).count())
        (run(li), run(replicate(li, 5, Seq("l_orderkey"), 10000000L)))
      },
      "window_scd" -> {
        import org.apache.spark.sql.expressions.Window
        def run(d: DataFrame) = time(d.withColumn("rn",
          row_number().over(Window.partitionBy("l_suppkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")))
          .filter(col("rn") === 1).count())
        (run(li), run(replicate(li, 5, Seq("l_orderkey"), 10000000L)))
      },
      "minhash_lsh" -> {
        def run(d: DataFrame) = time(
          operators.DedupOps.minhashPipeline(d.select("doc_id", "text"), 0.5).count())
        (run(docs), run(replicate(docs, 5, Seq("doc_id"), 1000000L)))
      },
      "simhash" -> {
        def run(d: DataFrame) = time(
          operators.DedupOps.simhashPipeline(d.select("doc_id", "text"), 3).count())
        (run(docs), run(replicate(docs, 5, Seq("doc_id"), 1000000L)))
      }
    )
    results.foreach { case (name, (t1, t5)) =>
      println(f"PROBE $name%-12s 1x=${t1}%.2fs 5x=${t5}%.2fs ratio=${t5 / t1}%.1f")
    }
    spark.stop()
  }
}
