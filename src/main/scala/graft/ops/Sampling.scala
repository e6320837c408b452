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

  def exactPerGroup(df: DataFrame, groupCol: String, n: Int,
      seed: Long, tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__sample_key") +: tieBreak: _*)
    df.withColumn("__sample_key", rand(seed))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__sample_key", "__rn")
  }
}
