package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof per-group ranking — `row_number() OVER (PARTITION BY g
  * ORDER BY v DESC, id)` without ever materializing a hot group in one
  * window task.
  *
  * A per-group window distributes across GROUPS; it does nothing for
  * the group that IS the skew (one domain with half the crawl, one
  * event type with half the firehose). At 100 TB that group becomes a
  * single sort task — the window twin of the "last reducer". This is
  * the grouped generalization of [[Budget.selectByBudget]]'s two-level
  * scan:
  *
  *   1. range-bucket each row by its sort value (global min/max from a
  *      1-row broadcast; the bucket map is monotone DESC, so bucket
  *      ascending == value descending and EQUAL values always share a
  *      bucket — ties stay inside one window);
  *   2. intra-bucket `row_number` under `PARTITION BY (g, bucket)` —
  *      a hot group now fans out over `buckets` parallel tasks;
  *   3. per-(g, bucket) counts (partial-aggregable, ≤ |groups|·buckets
  *      rows) get per-group running offsets over their own tiny
  *      windows, broadcast back; rank = offset + intra.
  *
  * The result is exactly the naive window's row_number (the DuckDB
  * oracle replays the naive spelling, so the driver's hash gate is a
  * plan-equivalence proof), but the plan never sorts a whole group in
  * one task. Uniform values would put everything in one bucket — the
  * map degrades to the naive plan, never below it; at 100 TB pick
  * `buckets` ≥ cluster parallelism / |groups|.
  */
object SaltedWindow {

  /** Per-group dense row numbering by `(sortCol DESC, idCol ASC)`,
    * exposed as `rank`. `idCol` must be unique within a group (total
    * order ⇒ deterministic). `sortCol` is cast to double for the
    * bucket map only; ordering uses the original column. */
  def groupedRank(df: DataFrame, groupCol: String, sortCol: String,
      idCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0)
    val v = col(sortCol).cast("double")
    val bounds = df.agg(min(v).as("_lo"), max(v).as("_hi"))
    val rows = df.crossJoin(broadcast(bounds))
      .withColumn("_bucket",
        least(lit(buckets - 1), greatest(lit(0),
          floor((col("_hi") - v) / greatest(col("_hi") - col("_lo"), lit(1e-300))
            * buckets).cast("int"))))
      .drop("_lo", "_hi")
    val intra = row_number().over(
      Window.partitionBy(col(groupCol), col("_bucket"))
        .orderBy(col(sortCol).desc, col(idCol)))
    // counted from the raw rows → map-side partial aggregation to
    // ≤ |groups|·buckets rows before the tiny offset window
    val offsets = rows.groupBy(col(groupCol), col("_bucket"))
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_offset",
        coalesce(sum(col("_bn")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("_bucket"), col("_offset"))
    rows.withColumn("_intra", intra)
      .join(broadcast(offsets), Seq(groupCol, "_bucket"))
      .withColumn("rank", col("_offset") + col("_intra"))
      .drop("_bucket", "_intra", "_offset")
  }
}
