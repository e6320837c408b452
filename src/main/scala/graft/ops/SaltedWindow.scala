package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof per-group ranking — `row_number() OVER (PARTITION BY g
  * ORDER BY v [DESC|ASC], id)` without ever materializing a hot group
  * in one window task.
  *
  * A per-group window distributes across GROUPS; it does nothing for
  * the group that IS the skew (one domain with half the crawl, one
  * event type with half the firehose). At 100 TB that group becomes a
  * single sort task — the window twin of the "last reducer". This is
  * the grouped generalization of [[Budget.selectByBudget]]'s two-level
  * scan:
  *
  *   1. range-bucket each row by its sort value (global min/max from a
  *      1-row broadcast; the bucket map is monotone in the sort
  *      direction, so bucket ascending == rank ascending and EQUAL
  *      values always share a bucket — ties stay inside one window);
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
  *
  * NULL sort values rank LAST in either direction (they route to the
  * final bucket and the intra-bucket sort uses explicit
  * `_nulls_last`), matching DuckDB's default `NULLS LAST` — NOT
  * Spark's `asc` default of nulls-first, so an oracle twin written as
  * plain `ORDER BY v` agrees with this operator on both engines.
  */
object SaltedWindow {

  /** Per-group dense row numbering by `(sortCol DESC|ASC, idCol ASC)`,
    * exposed as `rank`. `idCol` must be unique within a group (total
    * order ⇒ deterministic). `sortCol` is cast to double for the
    * bucket map only; ordering uses the original column. */
  def groupedRank(df: DataFrame, groupCol: String, sortCol: String,
      idCol: String, buckets: Int = 256, ascending: Boolean = false): DataFrame =
    rankAndTotal(df, groupCol, sortCol, idCol, buckets, ascending).drop("group_n")

  /** [[groupedRank]] plus the per-group row count as `group_n` — the
    * extra column costs one more tiny aggregate over the ≤
    * |groups|·buckets offsets frame (already broadcast), nothing on
    * the row stream. From (rank, group_n) the whole relative-rank
    * family falls out without a per-group sort task:
    * `percent_rank = (rank-1)/(group_n-1)` and, under a total
    * (tie-broken) ordering, `cume_dist = rank/group_n`. */
  def groupedRankWithTotal(df: DataFrame, groupCol: String, sortCol: String,
      idCol: String, buckets: Int = 256, ascending: Boolean = false): DataFrame =
    rankAndTotal(df, groupCol, sortCol, idCol, buckets, ascending)

  /** Columns rankAndTotal introduces: working (`_lo/_hi/_bucket/_intra/
    * _offset/_bn`, dropped) and output (`rank`, `group_n`). */
  private val OwnedColumns = Set(
    "_lo", "_hi", "_bucket", "_intra", "_offset", "_bn", "rank", "group_n")

  private def rankAndTotal(df: DataFrame, groupCol: String, sortCol: String,
      idCol: String, buckets: Int, ascending: Boolean): DataFrame = {
    require(buckets > 0)
    // one guard at the operator, protecting EVERY caller: an input
    // column named like a working column would be silently replaced
    // and dropped (or, for rank/group_n, shadowed in the output) —
    // refuse instead of corrupting (SaltedJoin's '_salt' discipline)
    val clash = df.columns.filter(OwnedColumns)
    require(clash.isEmpty,
      s"SaltedWindow uses ${clash.mkString("/")} as working/output " +
        "columns; rename them on the input first")
    val v = col(sortCol).cast("double")
    val bounds = df.agg(min(v).as("_lo"), max(v).as("_hi"))
    // monotone bucket map in the sort direction; NULL v → last bucket
    // (greatest/least would silently send NULL to bucket 0 = rank 1)
    val span = greatest(col("_hi") - col("_lo"), lit(1e-300))
    val frac = if (ascending) (v - col("_lo")) / span else (col("_hi") - v) / span
    val rows = df.crossJoin(broadcast(bounds))
      .withColumn("_bucket",
        when(v.isNull, lit(buckets - 1)).otherwise(
          least(lit(buckets - 1), greatest(lit(0),
            floor(frac * buckets).cast("int")))))
      .drop("_lo", "_hi")
    val sortKey = if (ascending) col(sortCol).asc_nulls_last else col(sortCol).desc_nulls_last
    val intra = row_number().over(
      Window.partitionBy(col(groupCol), col("_bucket"))
        .orderBy(sortKey, col(idCol)))
    // counted from the raw rows → map-side partial aggregation to
    // ≤ |groups|·buckets rows before the tiny offset window
    val offsets = rows.groupBy(col(groupCol), col("_bucket"))
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_offset",
        coalesce(sum(col("_bn")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("group_n",
        sum(col("_bn")).over(Window.partitionBy(col(groupCol))))
      .select(col(groupCol), col("_bucket"), col("_offset"), col("group_n"))
    rows.withColumn("_intra", intra)
      .join(broadcast(offsets), Seq(groupCol, "_bucket"))
      .withColumn("rank", col("_offset") + col("_intra"))
      .drop("_bucket", "_intra", "_offset")
  }
}
