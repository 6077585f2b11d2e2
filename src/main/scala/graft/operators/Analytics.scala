package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational analytics surface (SURVEY.md §2.B).
  *
  * The reference pipeline's output tables feed BI dashboards
  * (reference README.md:12 — "Data Studio or Tableau"); these are the
  * query shapes such a consumer runs, expressed as declarative Spark
  * plans so Catalyst handles pushdown/pruning/join selection.
  *
  * Determinism-for-oracle conventions (every query here is DuckDB
  * hash-compared by the driver):
  *   - Monetary aggregates are computed in exact DECIMAL arithmetic and
  *     cast to double at the end — both engines then produce the SAME
  *     bits, with no float-summation-order sensitivity.
  *   - Averages are written sum/count over the exact decimal sum.
  *   - Every ORDER BY ... LIMIT has a unique-key tiebreaker so top-k is
  *     a total order in both engines.
  */
object Analytics {

  /** Cast to exact decimal before aggregating: makes sums
    * order-insensitive (hence cluster-reproducible at any parallelism,
    * including 1000 executors) and bit-identical to the DuckDB oracle. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** B1: pricing summary — multi-aggregate groupBy over the fact table
    * (TPC-H Q1 shape). Scale: single shuffle on a 6-value grouping key,
    * partial aggregation map-side; scan prunes to 9 of 11 columns. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val one = lit(1).cast(DecimalType(12, 2))
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")) *
            (one + dec($"l_tax"))).cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql
  )
}
