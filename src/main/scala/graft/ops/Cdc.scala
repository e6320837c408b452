package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture log application — fold an append-only change
  * log (upserts + deletes) into a base snapshot, latest change per key
  * winning. The maintenance primitive behind every incrementally
  * maintained lakehouse table (Delta/Iceberg `MERGE INTO`, Hudi
  * upsert): nightly crawl deltas folded into the corpus snapshot,
  * label fixes folded into a training table.
  *
  * Scale shape: the log first collapses to ONE row per key via
  * `max_by(struct(op, payload), struct(version cols))` — a partial-
  * aggregable hash aggregate, so the shuffle carries at most |keys|
  * pre-combined rows per map task, never the raw log (a day's log can
  * dwarf the snapshot's key count). The collapsed log then
  * full-outer-joins the snapshot on the key — both sides shuffle once
  * on the same key (or co-locate for free if both are bucketed by
  * key, the layout a production snapshot would keep). NO window over
  * the log: `row_number() OVER (PARTITION BY key ORDER BY version
  * DESC)` puts a hot key's whole history in one task, and CDC logs
  * are exactly where keys go hot (one popular row updated millions of
  * times). The aggregate form keeps a hot key map-side-combined.
  *
  * The version must be a total order per key (caller supplies a
  * tie-break column, e.g. the log sequence number) — otherwise
  * "latest" is nondeterministic on both engines.
  */
object Cdc {

  /** Apply `log` to `base`.
    *
    * @param base     snapshot, one row per `key`
    * @param log      change rows: `key`, `opCol` ('u' upsert / 'd'
    *                 delete), payload columns, version columns
    * @param key      join/merge key column name
    * @param opCol    operation column name in `log`
    * @param version  columns whose struct orders changes per key
    *                 (last = tie-break; must make the order total)
    * @param payload  log columns that overwrite base columns of the
    *                 same name on upsert (and populate inserts)
    * @return the merged snapshot: base rows with no change survive
    *         unchanged; upserts overwrite payload columns (inserting
    *         the key if absent from base); deletes remove the row
    *         even if it was never in base (idempotent).
    */
  def apply(base: DataFrame, log: DataFrame, key: String, opCol: String,
      version: Seq[String], payload: Seq[String]): DataFrame = {
    val pick = struct((opCol +: payload).map(col): _*)
    val ord = struct(version.map(col): _*)
    val latest = log.groupBy(col(key))
      .agg(max_by(pick, ord).as("_chg"))
      .select(col(key) +: (opCol +: payload).map(c => col(s"_chg.$c").as(s"_c_$c")): _*)
    val merged = base.join(latest, Seq(key), "full_outer")
      .filter(col(s"_c_$opCol").isNull || col(s"_c_$opCol") =!= "d")
    val baseCols = base.columns.filter(_ != key)
    // gate on the op column, NOT coalesce: an upsert carrying NULL in a
    // payload column must overwrite the base value with NULL (the
    // scaladoc contract) — coalesce would silently keep the old value
    val out: Seq[Column] = col(key) +: baseCols.map { c =>
      if (payload.contains(c))
        when(col(s"_c_$opCol").isNotNull, col(s"_c_$c")).otherwise(col(c)).as(c)
      else col(c)
    }.toSeq
    merged.select(out: _*)
  }

  /** Versioned CDC state fold — the continuous-ingest form. [[apply]]
    * assumes the log batch at hand holds each key's FULL recent
    * history; under streaming triggers that breaks: if batch 1 carried
    * key k's version-9 update and batch 2 carries a straggling
    * version-7 update, blind re-application would resurrect the old
    * value (and an out-of-order upsert after a delete would resurrect
    * the row). The fix is the standard log-structured one (Hudi's
    * preCombine, Kafka-compaction semantics): the STATE keeps each
    * key's winning (op, payload, version) — tombstones included — and
    * a fold is just "union, re-collapse":
    *
    *   fold(state, batch) = collapse(state ∪ batch)
    *
    * `max_by` under a total version order is associative and
    * commutative, so any partition of the log into batches, arriving
    * in any order, converges to `collapse(whole log)` — CdcSpec
    * proves it by folding permuted batch orders; the streaming spec
    * drives it through foreachBatch. Readers see [[live]] (tombstones
    * filtered); a compaction horizon may drop tombstones once
    * straggler arrival is impossible (retention contract, caller's
    * clock).
    *
    * Scale shape: same as [[apply]] — one partial-aggregable hash
    * aggregate per fold, shuffle bounded by |keys|; a parquet state
    * table bucketed by key makes successive folds co-partitioned. */
  def foldVersioned(state: DataFrame, batch: DataFrame, key: String,
      opCol: String, version: Seq[String], payload: Seq[String]): DataFrame = {
    val cols = (opCol +: payload) ++ version
    val all = state.select((key +: cols).map(col): _*)
      .unionByName(batch.select((key +: cols).map(col): _*))
    val pick = struct(cols.map(col): _*)
    all.groupBy(col(key))
      .agg(max_by(pick, struct(version.map(col): _*)).as("_s"))
      .select(col(key) +: cols.map(c => col(s"_s.$c").as(c)): _*)
  }

  /** Reader view of a versioned state: tombstones filtered out. */
  def live(state: DataFrame, opCol: String): DataFrame =
    state.filter(col(opCol) =!= "d")
}
