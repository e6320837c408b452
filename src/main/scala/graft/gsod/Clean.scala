package graft.gsod

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleaning stage: sentinel→null rewriting and null profiling
  * (SURVEY.md §2.2 P8, §2.3 F1, §4.3.1).
  */
object Clean {

  /** Rewrite sentinel doubles to null (ipynb c7:10-11:
    * `when(col == sentinel, None).otherwise(col)` per column).
    * All rewrites are one collapsed Project — no shuffle, stays inside
    * whole-stage codegen. */
  def sentinelToNull(df: DataFrame,
      sentinels: Map[String, Double] = GsodSchema.sentinels): DataFrame = {
    val present = sentinels.filter { case (c, _) => df.columns.contains(c) }
    val exprs = df.columns.map { c =>
      present.get(c) match {
        case Some(s) => when(col(c) === lit(s), lit(null)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** Per-column null counts in ONE job (SURVEY §4.3.1) — replaces the
    * reference's 32 separate `filter(isNull).count()` jobs (ipynb c8:2)
    * with a single aggregate whose partial states combine map-side.
    * Output: one row, one column per input column. */
  def missingCounts(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    df.agg(
      sum(when(col(cols.head).isNull, 1L).otherwise(0L)).as(cols.head),
      cols.tail.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*)
  }

  /** Same, collected to a Map for driver-side control flow (the
    * imputation loop needs the scalar). */
  def missingCountMap(df: DataFrame, columns: Seq[String] = Nil): Map[String, Long] = {
    val row = missingCounts(df, columns).head()
    row.schema.fieldNames.map(f => f -> row.getAs[Long](f)).toMap
  }

  /** Drop the reference's discarded columns (ipynb c12:5). */
  def dropSparseColumns(df: DataFrame): DataFrame =
    df.drop(GsodSchema.columnsToDrop.filter(df.columns.contains): _*)
}
