package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator queries (SURVEY.md §2.1–§2.8) over the
  * harness tables, each paired with a DuckDB oracle twin in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Conventions (FIXTURES.md §B): every query ends in a total `orderBy`
  * over its key columns so the driver's hash compare is order-stable;
  * every computed column is aliased identically in the Spark expression
  * and the oracle SQL.
  */
object CoreQueries {

  /** TPC-H Q1-shaped pricing summary: grouped multi-aggregate over the
    * largest table. Partial (map-side) aggregation + one shuffle on a
    * low-cardinality key — the canonical scale-out agg shape.
    * Ref: ipynb c13:23-27 (global multi-agg, SURVEY §2.5 A1). */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(l_extendedprice) AS sum_base_price,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
      |  avg(l_quantity) AS avg_qty,
      |  avg(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
