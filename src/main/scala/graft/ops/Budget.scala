package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — the pretraining data-mix step:
  * rank every document by a quality score and keep the best prefix
  * whose cumulative token count fits a global budget (here a fixed
  * fraction of the corpus's total tokens, kept as exact integer
  * arithmetic so both engines agree bit-for-bit).
  *
  * The semantics are a GLOBAL ordered prefix sum over `(quality DESC,
  * id)` — which a naive `Window.orderBy(...)` with no partitionBy
  * plans as a SINGLE task holding the entire corpus. Like
  * [[Packing.blockPack]], this runs the two-level scan instead, with
  * one twist: the order key is a double in [0,1] ordered DESC, so the
  * range bucket is `floor((1-q)·B)` — monotone non-increasing in
  * quality, hence bucket ascending == quality descending, and equal
  * scores always share a bucket (ties broken inside the bucket's
  * window by `idCol`):
  *
  *   1. intra-bucket prefix sums under
  *      `Window.partitionBy(_bucket).orderBy(q DESC, id)` — parallel,
  *      one task per bucket;
  *   2. per-bucket totals (partial-aggregable groupBy to B rows) get
  *      their own tiny prefix sum — single-task but over B rows;
  *   3. offsets broadcast back; a 1-row corpus-total scalar attaches
  *      via broadcast crossJoin for the budget predicate.
  *
  * The budget predicate `cum · den <= total · num` stays in longs:
  * no double round-trip, so selection is exact at any corpus size
  * (9.2e18 token-steps of headroom).
  *
  * Skew note: quality scores concentrate (many docs score exactly
  * 1.0), so bucket 0 can be heavy. `buckets` trades bucket-window
  * parallelism against the size of the offset table; at 100 TB raise
  * it (2^14+) and/or sub-salt the hot bucket by hashing `idCol` into
  * the partition key and re-merging offsets — the bucket totals stay
  * partial-aggregable either way.
  */
object Budget {

  /** Rows of `df` whose greedy `(qualityCol DESC, idCol)` cumulative
    * `weightCol` stays within `num/den` of the total weight, with the
    * running total exposed as `cum_weight`. `qualityCol` must lie in
    * [0,1] (clamped defensively); `weightCol` >= 0 integral;
    * `idCol` unique (total order ⇒ deterministic selection). */
  def selectByBudget(df: DataFrame, qualityCol: String, weightCol: String,
      idCol: String, num: Long, den: Long, buckets: Int = 1024): DataFrame = {
    require(num >= 0 && den > 0 && buckets > 0)
    val q = col(qualityCol).cast("double")
    val rows = df
      .withColumn("_w", col(weightCol).cast("long"))
      .withColumn("_bucket",
        least(lit(buckets - 1), greatest(lit(0),
          floor((lit(1.0) - q) * buckets).cast("int"))))
    val intra = sum(col("_w")).over(
      Window.partitionBy(col("_bucket"))
        .orderBy(q.desc, col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val withIntra = rows.withColumn("_intra", intra)
    // Aggregated from the raw rows, not the window output, so this
    // branch partial-aggregates map-side to `buckets` rows before its
    // own tiny shuffle (same reasoning as Packing.blockPack).
    val offsets = rows.groupBy(col("_bucket")).agg(sum(col("_w")).as("_btotal"))
      .withColumn("_offset",
        coalesce(sum(col("_btotal")).over(
          Window.orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val total = rows.agg(sum(col("_w")).as("_total"))
    withIntra
      .join(broadcast(offsets.select(col("_bucket"), col("_offset"))), "_bucket")
      .crossJoin(broadcast(total))
      .withColumn("cum_weight", col("_offset") + col("_intra"))
      .filter(col("cum_weight") * den <= col("_total") * num)
      .drop("_bucket", "_w", "_intra", "_offset", "_total")
  }
}
