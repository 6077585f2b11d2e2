package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All graft operators take `(spark, sfDir)` and read through here, so
  * the same plans run unchanged against any parquet layout (local test
  * SF dirs today, a partitioned 100 TB lake path in production —
  * `sfDir` is just a prefix). Reads are plain parquet scans: Catalyst
  * pushes filters/column pruning down into them, so operators must NOT
  * cache or materialize here.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet's `ts` physical layout has varied across testdata
    * generations: TIMESTAMP(NANOS) (unreadable natively — the legacy
    * conf surfaces it as a nanos long we floor to µs, matching DuckDB's
    * ns→µs truncation) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (read as TIMESTAMP_NTZ). Both normalize to the session-tz
    * TimestampType every downstream operator and oracle was built
    * against — all graft sessions pin UTC, so the NTZ→LTZ cast is
    * value-identity.
    *
    * The Long branch does NOT assume nanos from the physical type
    * alone (a future generation writing plain INT64 micros would also
    * surface as LongType): the unit is decided per value by magnitude
    * — ns ≥ 3·10¹⁷ from mid-1979 on, while µs stays < 4.2·10¹⁵
    * until year 2100 — so the two encodings are unambiguous for any
    * plausible event time and the ÷1000 only fires on genuine
    * nano-scale values. A row-level `when` costs nothing extra
    * (codegen'd projection) and needs no pre-scan job. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CASE WHEN abs(ts) >= 300000000000000000 " +
            "THEN ts DIV 1000 ELSE ts END)"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
