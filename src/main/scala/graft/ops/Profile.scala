package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiler — per-column null count, exact distinct
  * count, and (for numeric columns) min/max, emitted in long form.
  *
  * The reference's EDA loop runs one `filter(isNull).count()` job per
  * column (ipynb c8:2, c20:2 — 32 jobs re-scanning the full lineage
  * each time; SURVEY §4.3.1 names it the top anti-pattern). This is
  * the single-job spelling: ALL per-column statistics ride one
  * aggregate over one scan, then the 1-row result is unpivoted with
  * `explode` — no collect, no per-column job, no second scan.
  *
  * Scale notes: multiple exact `countDistinct`s in one aggregate plan
  * through a single Expand (one scan, ×(cols+1) row fan-out before the
  * partial agg). That is the right trade at profile-report
  * cardinalities; for very wide tables at 100 TB pass `approx = true`
  * to use `approx_count_distinct` (HLL partial aggs, no Expand) — the
  * driver oracle pins the exact path, the approx path is the scale
  * tier (same twin pattern as q_ntile vs q_ntile_approx).
  */
object Profile {

  /** Profile `cols` of `df`; `(name, isNumeric)` per column. Numeric
    * columns additionally report min/max cast to double; strings get
    * NULL min/max (a string min/max would hash-compare renderings, not
    * values). */
  def profile(df: DataFrame, cols: Seq[(String, Boolean)],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { case (c, num) =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"${c}__distinct")) ++
        (if (num)
          Seq(min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"))
        else Nil)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { case (c, num) =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__nulls").as("null_count"),
        col(s"${c}__distinct").as("n_distinct"),
        (if (num) col(s"${c}__min") else lit(null).cast("double")).as("min_val"),
        (if (num) col(s"${c}__max") else lit(null).cast("double")).as("max_val"))
    }
    row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
