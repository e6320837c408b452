package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed group keys.
  *
  * A plain `groupBy(k).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB a single skewed key stalls the stage. Salting
  * splits each key into `numSalts` subgroups (stage 1: partial agg on
  * (k, salt)), then combines the per-salt partials (stage 2: final agg
  * on k). Both stages are hash aggregations with map-side combine; the
  * second stage's input is at most `numSalts × |distinct keys|` rows.
  *
  * Only algebraic aggregates decompose this way — sum/count/min/max
  * here (avg = salted sum / salted count, done below).
  */
object SaltedAgg {

  /** Salted sum/count/min/max/avg of `valueCol` grouped by `keyCols`. */
  def aggregate(df: DataFrame, keyCols: Seq[String], valueCol: String,
      numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val stage1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(valueCol)).as("__sum"),
        count(col(valueCol)).as("__cnt"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__sum")).as("sum_value"),
        sum(col("__cnt")).as("n"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))
  }
}
