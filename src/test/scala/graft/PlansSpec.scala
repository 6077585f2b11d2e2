package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.plans.{AsOf, GraftExtensions}

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  test("as-of join picks the latest right row at or before the left time") {
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 5L, "t0"), ("B", 7L, "t3"))
      .toDF("sym", "t_ts", "trade")
    val quotes = Seq(
      ("A", 8L, 100.0), ("A", 15L, 101.0), ("B", 9L, 50.0))
      .toDF("q_sym", "q_ts", "px")
    val out = AsOf.join(trades, quotes, "sym", "q_sym", "t_ts", "q_ts")
      .select($"trade", $"px").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t0").isEmpty)          // before any quote
    assert(out("t1").contains(100.0))  // quote@8 <= 10
    assert(out("t2").contains(101.0))  // quote@15 <= 20
    assert(out("t3").isEmpty)          // B's only quote is after 7
  }

  test("as-of join is inclusive on equal timestamps") {
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 10L, "hit")).toDF("rk", "rts", "v")
    val out = AsOf.join(l, r, "k", "rk", "ts", "rts").collect()
    assert(out.head.getAs[String]("v") == "hit")
  }
}

class ExtensionsSpec extends SparkSuite {

  private lazy val extSpark: SparkSession = {
    // build a sibling session (shared SparkContext) with the graft
    // extensions installed
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(SparkSuite.session)
    SparkSession.setActiveSession(SparkSuite.session)
    s
  }

  test("extension-injected SQL functions resolve and compute") {
    val r = extSpark.sql(
      """SELECT graft_hamming64(graft_simhash64('the quick brown fox'),
        |                       graft_simhash64('the quick brown fox')) AS d,
        |       graft_rolling_hash64('abc') AS h,
        |       size(graft_shingle_hashes('a b c d', 2)) AS n""".stripMargin)
      .collect().head
    assert(r.getAs[Int]("d") == 0)
    assert(r.getAs[Long]("h") == graft.functions.GraftHash.rolling64(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getAs[Int]("n") == 3)
  }

  // parquet-backed column: non-foldable input, so only the injected
  // rule can collapse the self-comparison
  private def selfHamming(s: SparkSession) =
    Tables.documents(s, sf)
      .select(gf.hamming64(gf.rolling_hash64(col("text")),
        gf.rolling_hash64(col("text"))).as("d"))

  test("SimplifySelfSimilarity folds hamming(x,x) to a literal 0") {
    val df = selfHamming(extSpark)
    val optimized = df.queryExecution.optimizedPlan.toString
    // nullable input folds to If(IsNull(...), null, 0) — hamming gone
    assert(!optimized.contains("graft_hamming64"), optimized)
    assert(df.collect().forall(_.getInt(0) == 0))
  }

  test("rule does not fire without the extension installed") {
    val optimized = selfHamming(spark).queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_hamming64"), optimized)
  }
}
