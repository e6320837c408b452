package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-size per-group sampling — the training-data curation op
  * `sampleBy` can't express: `sampleBy` is Bernoulli (expected
  * fraction, variable count), this returns EXACTLY min(n, |group|)
  * rows per group, uniformly without replacement.
  *
  * Shape: a seeded uniform key per row + per-group top-n on that key
  * (one shuffle on the group key; Catalyst runs the row_number filter
  * as a running window, so only n rows per group survive the sort
  * buffer). At 100 TB scale with huge groups, the sort-based form is
  * O(|group| log |group|) per group — acceptable because the shuffle
  * dominates; a two-phase threshold refinement (sample the key
  * distribution, filter, then exact-trim) would cut the sort if it
  * ever shows up in profiles.
  *
  * Determinism: `rand(seed)` is seeded per partition, so results are
  * reproducible for a fixed input layout + seed (same caveat as
  * Spark's own sampleBy/randomSplit); `tieBreak` pins row order when
  * two keys collide.
  */
object Sampling {

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * IPL 2006 "Weighted random sampling with a reservoir", A-ES): each
    * row gets key `u^(1/w)` for uniform u and weight w, and the k
    * largest keys form a sample where inclusion probability is
    * proportional to weight — the quality-weighted corpus subsample
    * (weight = quality score / length / importance weight) that plain
    * Bernoulli sampling can't produce at an exact size.
    *
    * Computed in log space (`ln(u)/w`, monotone in u^(1/w) — larger is
    * better both ways) to keep precision when weights are large. u is
    * the PORTABLE multiplicative hash of the unique row key, shared
    * with the hash-stratified sampling tier ([[DomainMix.portableBucket]]),
    * so the selection is deterministic AND the DuckDB oracle can replay
    * it exactly in ANSI SQL: same hash, same ln/division (rounded to 9
    * before ranking per the float policy, id tie-break after).
    *
    * Scale: the key is in-row arithmetic; the global top-k compiles to
    * TakeOrderedAndProject (per-partition heaps, no global sort) —
    * PlanSpec-checkable. Rows with non-positive weight are excluded
    * (they'd never be sampled: w→0 ⇒ key→−∞). */
  /** The A-ES exponential key — ONE definition shared by
    * [[weightedTopK]] and the composition gate
    * (qSampleWeightedBounds), so the certified path IS the serve
    * path. */
  def aesKey(rowKey: Column, weight: Column): Column = round(
    log((DomainMix.portableBucket(rowKey) + 1L) / lit(1000001.0)) / weight, 9)

  def weightedTopK(df: DataFrame, rowKey: Column, weight: Column, k: Int,
      tieBreak: Seq[Column]): DataFrame =
    df.filter(weight > 0)
      .withColumn("wkey", aesKey(rowKey, weight))
      .orderBy(col("wkey").desc +: tieBreak: _*)
      .limit(k)

  def exactPerGroup(df: DataFrame, groupCol: String, n: Int,
      seed: Long, tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__sample_key") +: tieBreak: _*)
    df.withColumn("__sample_key", rand(seed))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__sample_key", "__rn")
  }

  /** The production spelling of [[exactPerGroup]] — exact-k per-group
    * sampling that fixes BOTH of the rand/window form's documented
    * weaknesses at once: the sample key is the portable multiplicative
    * hash of a caller-supplied row key (a pure function of the DATA —
    * layout-independent and reproducible across re-partitioned or
    * compacted inputs, where `rand(seed)` silently reshuffles; and
    * replayable by an ANSI-SQL oracle, which makes the full sampled
    * ROWS hash-checkable, not just their counts), and the per-group
    * top-n rides [[SaltedWindow.groupedRank]]'s two-level bucketed
    * ranking — a sample stratified over FEW HOT groups (3 return
    * flags owning the whole fact table) never lands a group's full
    * row set in one window task. Ties on the hash (the key space is
    * 1e6 buckets, so collisions are routine) break on `tieKey`, which
    * the CALLER must make injective per row (distinct rows, distinct
    * tie keys — e.g. a fixed-width concat of the table's key columns):
    * SaltedWindow's determinism contract needs a total order, and a
    * lossy packed key that collides for distinct rows would let
    * layout decide which of two tied rows crosses the rank-n boundary
    * — exactly the nondeterminism this operator exists to remove. */
  def exactPerGroupHashed(df: DataFrame, groupCol: String, n: Int,
      rowKey: Column, tieKey: Column): DataFrame = {
    // '__row_key'/'__sample_key'/'rank' are working columns — refuse
    // inputs that would silently collide (SaltedJoin's guard)
    require(!df.columns.exists(Set("__row_key", "__sample_key", "rank")),
      "exactPerGroupHashed uses __row_key/__sample_key/rank working " +
        "columns; rename them on the input first")
    SaltedWindow.groupedRank(
      df.withColumn("__row_key", tieKey)
        .withColumn("__sample_key", DomainMix.portableBucket(rowKey)),
      groupCol, "__sample_key", "__row_key", ascending = true)
      .filter(col("rank") <= n)
      .drop("__sample_key", "__row_key", "rank")
  }
}
