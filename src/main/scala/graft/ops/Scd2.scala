package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 snapshot maintenance — the
  * merge/upsert a training-data pipeline needs for its dimension and
  * metadata tables (source registries, license states, domain labels):
  * keep FULL history of every attribute change, with `effective_from`
  * / `effective_to` validity ranges and an `is_current` flag, so any
  * past training run can be reproduced against the dimension values
  * that were current at its cutoff date.
  *
  * Semantics of one merge (the classic Kimball type-2 contract):
  *   - key in batch, payload differs from the current row → the
  *     current row CLOSES (`effective_to = asOf`, `is_current=false`)
  *     and a new open row starts at `asOf`;
  *   - key in batch, payload identical → no-op (no spurious versions);
  *   - key only in batch → new key, one open row;
  *   - key not in batch → carried unchanged.
  * Re-applying the same batch is therefore idempotent (Scd2Spec).
  *
  * Scale shape: closed HISTORY rows are never joined, scanned, or
  * rewritten — only the `is_current` slice meets the batch, as two
  * equi-joins on the key (both broadcast when the change batch is
  * small, one key-shuffle otherwise). At 100 TB the snapshot sits
  * partitioned by `is_current` (or history is a separate table), so
  * a day's merge reads |current| + |batch| rows, independent of how
  * many years of history have accumulated. No window function over
  * the full snapshot — the open/close decision is per-key local.
  */
object Scd2 {

  /** Apply one change batch to an SCD2 snapshot.
    *
    * @param snapshot columns: `key`, payload columns, `effective_from`
    *                 DATE, `effective_to` DATE (NULL = open),
    *                 `is_current` BOOLEAN. Exactly one open row per
    *                 live key (the invariant this function preserves).
    * @param batch    columns: `key` + the same payload columns — the
    *                 new truth as of `asOf`. Must be key-unique:
    *                 collapse multiple changes per key upstream (e.g.
    *                 latest-wins) before merging.
    * @param key      join key column name.
    * @param payload  payload column names; a row "changed" when any
    *                 payload column differs null-safely (`<=>`).
    * @param asOf     the change-batch date (closes + opens rows).
    */
  def merge(snapshot: DataFrame, batch: DataFrame, key: String,
      payload: Seq[String], asOf: Column): DataFrame = {
    val outCols = (Seq(key) ++ payload ++
      Seq("effective_from", "effective_to", "is_current")).map(col)

    val history = snapshot.filter(!col("is_current"))
    val current = snapshot.filter(col("is_current"))
    val b = batch.select((Seq(col(key).as(s"b_$key")) ++
      payload.map(c => col(c).as(s"b_$c"))): _*)

    // any payload column differs (null-safe) → the row versions
    val changed: Column = payload
      .map(c => !(col(c) <=> col(s"b_$c")))
      .reduce(_ || _)

    val curWithBatch = current.join(b, col(key) === col(s"b_$key"), "left_outer")
    // untouched keys + no-op payloads pass through; changed rows close
    val keptOrClosed = curWithBatch.select(
      (Seq(col(key)) ++ payload.map(col) ++ Seq(
        col("effective_from"),
        when(col(s"b_$key").isNotNull && changed, asOf)
          .otherwise(col("effective_to")).as("effective_to"),
        (!(col(s"b_$key").isNotNull && changed)).as("is_current"))): _*)

    // changed + brand-new keys open a fresh row at asOf
    val opened = b.join(current, col(s"b_$key") === col(key), "left_outer")
      .filter(col(key).isNull || changed)
      .select(
        (Seq(col(s"b_$key").as(key)) ++
          payload.map(c => col(s"b_$c").as(c)) ++ Seq(
          asOf.as("effective_from"),
          lit(null).cast("date").as("effective_to"),
          lit(true).as("is_current"))): _*)

    history.select(outCols: _*)
      .unionByName(keptOrClosed)
      .unionByName(opened)
  }
}
