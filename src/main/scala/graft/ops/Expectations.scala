package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a
  * training pipeline runs before a table is allowed to feed a job
  * (the Deequ/Great-Expectations role, re-expressed Spark-first).
  *
  * A check list compiles into ONE conditional-aggregation pass over
  * the table: every check contributes scalar aggregate expressions to
  * a single `agg(...)`, and the 1-row result unpivots into the
  * (check, metric, passed) report via `stack`. No per-check scan, no
  * driver-side loop over data — at 100 TB the report costs exactly
  * one read of the audited columns (column pruning keeps the scan
  * narrow), plus one shuffle-free map-side partial aggregate tree.
  * `Unique` adds a count-distinct (an Expand in the same pass);
  * referential integrity ([[orphanFraction]]) is the one check that
  * is genuinely a join, so it is a separate composable metric the
  * caller unions in.
  *
  * Metrics are FRACTIONS (violation rate), not violation counts:
  * thresholded monitoring survives table growth, and the report is
  * hash-oracle-able after the repo's standard `round(x, 9)`
  * float-determinism policy (a count ratio like 1/3 is not dyadic).
  */
object Expectations {

  sealed trait Check {
    def name: String
    /** Fraction of rows violating the expectation (0.0 = clean). */
    def violationFraction: Column
    /** Pass iff the violation fraction stays within `tolerance`. */
    def tolerance: Double
  }

  /** Column is never NULL (completeness). */
  final case class Complete(col: String, tolerance: Double = 0.0) extends Check {
    val name = s"complete($col)"
    def violationFraction: Column =
      avg(when(expr(col).isNull, 1.0).otherwise(0.0))
  }

  /** Column values are unique (primary-key property). Violation
    * fraction = 1 − distinct/total: 0 for a key, 0.5 when every value
    * occurs twice. An all-NULL column is vacuously unique (0.0) — the
    * unguarded 0/0 would read NaN, which `coalesce` does not catch and
    * engines disagree on (pair a Complete check to reject the NULLs
    * themselves). */
  final case class Unique(col: String, tolerance: Double = 0.0) extends Check {
    val name = s"unique($col)"
    def violationFraction: Column = {
      val nonNull = count(when(expr(col).isNotNull, 1))
      when(nonNull === 0, lit(0.0))
        .otherwise(lit(1.0) - countDistinct(expr(col)).cast("double") / nonNull)
    }
  }

  /** Table has at least `minRows` rows — the explicit emptiness gate
    * (the report also fails ALL checks on a zero-row table, but a Size
    * row names the condition in the report instead of implying it). */
  final case class Size(minRows: Long, tolerance: Double = 0.0) extends Check {
    val name = s"size(>=$minRows)"
    def violationFraction: Column =
      when(count(lit(1)) < minRows, lit(1.0)).otherwise(lit(0.0))
  }

  /** Non-null values fall in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double,
      tolerance: Double = 0.0) extends Check {
    val name = s"in_range($col)"
    def violationFraction: Column =
      avg(when(expr(col).isNotNull &&
        (expr(col) < lo || expr(col) > hi), 1.0).otherwise(0.0))
  }

  /** Non-null values belong to an allowed set. */
  final case class InSet(col: String, values: Seq[String],
      tolerance: Double = 0.0) extends Check {
    val name = s"in_set($col)"
    def violationFraction: Column =
      avg(when(expr(col).isNotNull &&
        !expr(col).isInCollection(values), 1.0).otherwise(0.0))
  }

  /** Arbitrary row predicate holds (escape hatch — the predicate must
    * be an expression both engines can evaluate if the report is to be
    * oracled). */
  final case class Satisfies(name: String, predicate: Column,
      tolerance: Double = 0.0) extends Check {
    def violationFraction: Column =
      avg(when(!predicate, 1.0).otherwise(0.0))
  }

  /** The single-pass report: one row per check —
    * (check, violation_fraction, tolerance, passed), ordered by check
    * name. `violation_fraction` is rounded to 9 decimals per the
    * float-determinism policy BEFORE the threshold compare, so report
    * and gate agree across engines. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check list")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      round(c.violationFraction, 9).as(s"_m$i")
    } :+ count(lit(1)).as("_n")
    val stackArgs = checks.zipWithIndex.map { case (c, i) =>
      s"'${c.name.replace("'", "''")}', _m$i, CAST(${c.tolerance} AS DOUBLE)"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("_n"), expr(
        s"stack(${checks.size}, $stackArgs) AS (check, violation_fraction, tolerance)"))
      // Fail-closed: a zero-row table fails EVERY check (avg over zero
      // rows is NULL, and the old NULL→0.0 coalesce silently PASSED an
      // empty table through the gate); any remaining NULL/NaN fraction
      // on non-empty input also reads as a violation, never a pass.
      .withColumn("violation_fraction",
        when(col("_n") === 0, lit(1.0))
          .otherwise(coalesce(
            nanvl(col("violation_fraction"), lit(null).cast("double")),
            lit(1.0))))
      .drop("_n")
      .withColumn("passed", col("violation_fraction") <= col("tolerance"))
      .orderBy(col("check"))
  }

  /** Referential integrity as a composable metric row: fraction of
    * `child` rows whose `childKey` has no match in `parent.parentKey`
    * (NULL child keys are orphans — a FK that permits NULL should
    * filter first). Shape: left-anti join on the key — at scale this
    * is the standard broadcast/shuffle hash join, never a per-row
    * lookup — over a count scalar. */
  def orphanFraction(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      tolerance: Double = 0.0): DataFrame = {
    val hits = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("_hit", lit(1))
    child.select(col(childKey))
      .join(hits, Seq(childKey), "left_outer")
      .agg(round(coalesce(
        avg(when(col("_hit").isNull, 1.0).otherwise(0.0)), lit(0.0)), 9)
        .as("violation_fraction"))
      .select(lit(s"references($childKey)").as("check"),
        col("violation_fraction"),
        lit(tolerance).as("tolerance"),
        (col("violation_fraction") <= tolerance).as("passed"))
  }
}
