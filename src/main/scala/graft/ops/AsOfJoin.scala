package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right
  * row with the same key and right.time <= left.time.
  *
  * Spark has no native as-of join; rather than a custom
  * `SparkStrategy`, this composes built-ins (preference (a) of
  * SURVEY §7.3): tag both sides, UNION them, and take
  * `last(right_value, ignoreNulls)` over a per-key window ordered by
  * (time, side) — right rows sort before co-timestamped left rows, so
  * ties resolve to "at or before".
  *
  * Scale: ONE shuffle on the key (the union sorts within partitions);
  * no join explosion, no range-condition nested loop. State per key is
  * a running "last seen right row" — the same shape a 1000-executor
  * sort-merge would produce. Skewed keys behave like any window
  * partition (AQE/salting apply).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its columns get attached)
    * @param keyCol     equi-key present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param attach     right-side columns to carry (renamed as given)
    * @param tieBreak   right-side column ordering co-timestamped right
    *                   rows; the LARGEST value wins (without it, ties
    *                   resolve by partition order — nondeterministic) */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String,
      attach: Map[String, String],
      tieBreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    // unified schema: key, t, side (0=right sorts first on ties), left
    // payload nulled on right rows, attached right payload nulled on
    // left rows
    val lTagged = left.select(
      (Seq(col(keyCol).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(Long.MaxValue).as("__tb")) ++
        leftCols.map(c => col(c).as(s"__l_$c")) ++
        attach.values.map(a => lit(null).as(s"__r_$a"))): _*)
    val rTagged = right.select(
      (Seq(col(keyCol).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieBreak).cast("long").as("__tb")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        attach.map { case (src, dst) => col(src).as(s"__r_$dst") }): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val filled = lTagged.unionByName(rTagged)
      .select((col("*") +:
        attach.values.toSeq.map(a =>
          last(col(s"__r_$a"), ignoreNulls = true).over(w).as(s"__asof_$a"))): _*)

    filled.filter(col("__side") === 1)
      .select((leftCols.map(c => col(s"__l_$c").as(c)) ++
        attach.values.map(a => col(s"__asof_$a").as(a))): _*)
  }
}
