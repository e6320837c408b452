package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key of two table generations as
  * added / removed / changed / unchanged.
  *
  * The audit step a pipeline runs between two generations of a curated
  * table before promoting the new one: "what did this rebuild actually
  * change?". Complements [[Scd2]] (which *merges* changes into a
  * versioned dimension) — diff is read-only and emits the change
  * classes themselves.
  *
  * Scale shape: one full-outer sort-merge join on the primary key —
  * both sides shuffle exactly once on the key and AQE handles skewed
  * keys. Change detection is a null-safe column-wise compare
  * (`<=>`), NOT a stringified row fingerprint: string rendering of
  * doubles/timestamps is engine- and locale-dependent, while `<=>` is
  * exact on the stored values and keeps the whole predicate inside
  * whole-stage codegen. Presence markers (`lit(true)` per side)
  * distinguish a missing row from a row whose compare columns are all
  * NULL.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on primary key `keyCols`, comparing
    * `compareCols` for in-place changes. Output: key columns +
    * `old_<c>`/`new_<c>` for each compare column + `diff_class` in
    * {added, removed, changed, unchanged}.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val a = oldDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c"))
        :+ lit(true).as("_in_old"): _*)
    val b = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c"))
        :+ lit(true).as("_in_new"): _*)
    val joined = a.join(b, keyCols, "full_outer")
    val changed: Column = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("diff_class",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("_in_old", "_in_new")
  }
}
