package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the rows no other row strictly
  * dominates on (minimize `xCol`, maximize `yCol`). The
  * multi-objective selection primitive (Börzsönyi et al., "The
  * Skyline Operator", ICDE'01): cheapest-earliest offers, best
  * quality-per-token documents under a length budget, non-dominated
  * hyperparameter trials.
  *
  * Strict-dominance form: p is dominated iff some q has `q.x < p.x`
  * AND `q.y > p.y`; survivors satisfy `y >= max{ y(q) : x(q) < x(p) }`.
  *
  * Scale shape: the naive spellings are the O(N²) self-anti-join
  * (`NOT EXISTS` — SkylineSpec replays it on the fixture as the
  * ground truth) or a whole-relation `RANGE BETWEEN UNBOUNDED
  * PRECEDING AND 1 PRECEDING` window (the DuckDB oracle's spelling —
  * one task sorting ALL of N at 100 TB, fine for an oracle, fatal for
  * the engine). Here the frontier test collapses to a
  * PER-DISTINCT-X pre-aggregate: groupBy(x) max(y)
  * is partial-aggregable (shuffle carries ≤ |distinct x| pre-combined
  * rows per map task), the strictly-before running max runs over that
  * aggregate frame — bounded by x's cardinality (dates, price points:
  * thousands regardless of corpus rows), the same bounded-frame window
  * argument as the distinct-source index in DomainMix — and the
  * per-x threshold joins back onto the row stream as an equi-join +
  * filter (no broadcast hint — a hint never auto-degrades; AQE picks
  * broadcast-hash when the aggregate fits, the same rationale as the
  * TF-IDF df table). The full relation is never sorted, never
  * windowed, never self-joined.
  *
  * Precondition: `xCol`'s cardinality must be window-able on one task
  * (dates, hours, price cents — physical/quantized axes). For a
  * continuous unbounded x, quantize first (the frontier of the
  * quantized relation is a superset filter; re-test survivors exactly
  * with a second, tiny pass).
  */
object Skyline {

  /** Frontier rows of `df` minimizing `xCol`, maximizing `yCol`
    * (strict dominance; ties on both axes all survive together).
    *
    * Preconditions: `xCol` must be non-null (a null x would sort
    * first in the running-max frame and spuriously dominate — filter
    * or impute before calling); null `yCol` rows never reach the
    * frontier (max() skips them, and a null y fails the threshold
    * compare), which is the "no value, no claim" reading. */
  def frontier2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("_ymax"))
    val threshold = perX
      .withColumn("_dom", max(col("_ymax")).over(
        Window.orderBy(col(xCol))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(xCol), col("_dom"))
    df.join(threshold, Seq(xCol))
      .filter(col("_dom").isNull || col(yCol) >= col("_dom"))
      .drop("_dom")
  }
}
