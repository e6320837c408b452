package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining-data layout op: concatenate an
  * ordered document stream into one token stream and cut it into
  * fixed-size training blocks, reporting for every document the token
  * interval it occupies and the blocks it straddles.
  *
  * The core primitive is a GLOBAL ordered prefix sum, which is exactly
  * the thing a naive `Window.orderBy(key)` (no partitionBy) gets
  * catastrophically wrong at scale: Spark plans an empty-partitioning
  * window as a SINGLE task holding the whole table. This implementation
  * is the classic two-level scan instead:
  *
  *   1. rows are grouped into `bucketWidth`-wide key ranges (monotone in
  *      the order key, so bucket order == key order);
  *   2. intra-bucket prefix sums run under
  *      `Window.partitionBy(bucket).orderBy(key)` — parallel across
  *      buckets, each task sees one bucket;
  *   3. per-bucket TOTALS (one row per bucket, partial-aggregable
  *      groupBy) get their own prefix sum — this window IS single-task,
  *      but over #buckets rows, not #rows (at 100 TB with 2²⁰-wide
  *      buckets that is ~10⁵ rows on one task, trivially fine);
  *   4. bucket offsets broadcast-join back and add to the intra sums.
  *
  * Contract: `orderCol` is a unique non-negative integral key (ties
  * would make the prefix sum nondeterministic); `weightCol` ≥ 0.
  */
object Packing {

  /** Per-document packing intervals over the `orderCol`-ordered stream:
    * `cum_start`/`cum_end` (token offsets, end-exclusive), and the
    * first/last `blockSize`-token training block the document touches.
    * Zero-weight rows carry no tokens and are dropped (they'd need a
    * null block span). */
  def blockPack(df: DataFrame, orderCol: String, weightCol: String,
      blockSize: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(blockSize > 0 && bucketWidth > 0)
    val key = col(orderCol)
    val w = col(weightCol).cast("long")
    val rows = df.filter(w > 0)
      // `div` = integral division (no double round-trip — a cast-back
      // from double would silently lose exactness past 2^53 tokens)
      .withColumn("_bucket", expr(s"$orderCol div $bucketWidth"))
    val intra = sum(w).over(
      Window.partitionBy(col("_bucket")).orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val withIntra = rows.withColumn("_intra", intra)
    // one row per bucket; the exclusive running total of PRIOR buckets
    // is each bucket's global offset. Deliberately aggregated from the
    // raw rows, NOT from the window output (whose max running sum is
    // also the total): the window subtree isn't materialized, so a
    // second reference would re-run its shuffle+sort, while this
    // branch partial-aggregates map-side to #buckets rows before its
    // own (tiny) shuffle.
    val offsets = rows.groupBy(col("_bucket")).agg(sum(w).as("_btotal"))
      .withColumn("_offset",
        coalesce(
          sum(col("_btotal")).over(
            Window.orderBy(col("_bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_bucket"), col("_offset"))
    withIntra
      .join(broadcast(offsets), Seq("_bucket"))
      .withColumn("cum_end", col("_offset") + col("_intra"))
      .withColumn("cum_start", col("cum_end") - w)
      .withColumn("first_block", expr(s"cum_start div $blockSize"))
      .withColumn("last_block", expr(s"(cum_end - 1) div $blockSize"))
      .withColumn("n_blocks", col("last_block") - col("first_block") + 1)
      .drop("_bucket", "_intra", "_offset")
  }
}
