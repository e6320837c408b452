package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.gsod.Impute

/** The reference's composite imputation operators (SURVEY.md §2.12)
  * exercised end-to-end over the harness `events` table, with derived
  * nulls (value of 'error' events treated as missing — the harness
  * tables themselves carry no nulls).
  *
  * These queries call the [[graft.gsod.Impute]] production operators
  * directly, so the driver's DuckDB oracle checks the actual imputer
  * implementation, not a reimplementation.
  */
object ImputeQueries {

  private def cleanedEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v",
        when(col("event_type") === lit("error"), lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("user_id"), col("ts"), col("v"))

  /** ProximityMedian (ipynb c16:60-113) over per-user event sequences:
    * one ±7 ROWS pass, then global-mean scalar fallback — both stages
    * SQL-expressible, so the oracle checks the full control flow. */
  def qImputeProximity(s: SparkSession, d: String): DataFrame = {
    val (out, _) = Impute.proximityMedian(
      cleanedEvents(s, d), "v",
      initialNumDays = 7, maxDays = 7, fallbackStrategy = "mean",
      partitionCols = Seq("user_id"), orderCols = Seq("ts", "event_id"))
    out.select(col("event_id"), col("user_id"), col("v").as("v_imputed"))
      .orderBy(col("event_id"))
  }

  val qImputeProximitySql: String =
    """WITH cleaned AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events
      |), p1 AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN v IS NULL THEN
      |      avg(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
      |    ELSE v END AS v
      |  FROM cleaned
      |)
      |SELECT event_id, user_id,
      |  coalesce(v, (SELECT avg(v) FROM p1)) AS v_imputed
      |FROM p1
      |ORDER BY event_id""".stripMargin

  /** MedianImputer (ipynb c16:1-55) over per-user groups: fill with the
    * user's median, global median for all-null users — as a broadcast
    * join + coalesce, not the reference's driver dict + Python UDF
    * (SURVEY §2.9 X3). */
  def qImputeStationMedian(s: SparkSession, d: String): DataFrame = {
    val (out, _) = Impute.medianImputer(cleanedEvents(s, d), "v", keyCol = "user_id")
    out.select(col("event_id"), col("user_id"), col("v").as("v_imputed"))
      .orderBy(col("event_id"))
  }

  val qImputeStationMedianSql: String =
    """WITH cleaned AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events
      |), gm AS (SELECT median(v) AS g FROM cleaned),
      |um AS (SELECT user_id, median(v) AS m FROM cleaned GROUP BY user_id)
      |SELECT c.event_id, c.user_id,
      |  CASE WHEN c.v IS NULL THEN coalesce(um.m, gm.g) ELSE c.v END AS v_imputed
      |FROM cleaned c
      |LEFT JOIN um USING (user_id)
      |CROSS JOIN gm
      |ORDER BY c.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_impute_proximity" -> (qImputeProximity _),
    "q_impute_station_median" -> (qImputeStationMedian _))

  val oracles: Map[String, String] = Map(
    "q_impute_proximity" -> qImputeProximitySql,
    "q_impute_station_median" -> qImputeStationMedianSql)
}
