package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair each probe row with every interval row
  * whose half-open window `[start, end)` contains the probe's time
  * (optionally under equi-keys). The temporal containment/overlap
  * primitive behind alerting windows, ad-attribution windows, outage
  * blast-radius queries, and sensor-to-maintenance-window matching —
  * and the classic Spark planning trap: spelled naively
  * (`probe JOIN intervals ON t >= start AND t < end`) there is no
  * equi-predicate, so Catalyst plans a BroadcastNestedLoopJoin or a
  * cartesian product, O(|probe|·|intervals|) at any scale.
  *
  * == Two-path plan ==
  * Times are caller-provided longs (epoch micros by convention), so
  * all bucket arithmetic is exact integer math:
  *
  *   - '''short intervals''' (span ≤ `maxSpanBuckets` fixed-width time
  *     buckets): each interval row is replicated once per covered
  *     bucket (bounded fan-out ≤ `maxSpanBuckets` copies), each probe
  *     row maps to exactly ONE bucket, and the two sides meet in a
  *     plain shuffled equi-join on (keys…, bucket) with the exact
  *     range predicate as the residual filter. Because a probe row
  *     joins only the copy in its own bucket and copies of one
  *     interval cover disjoint buckets, a (probe, interval) pair can
  *     match at most once — no dedup pass needed.
  *   - '''long tail''' (span > `maxSpanBuckets`): rare by the caller's
  *     choice of `bucketWidth` (pick it ≈ the typical interval
  *     length); these rows are broadcast and range-joined directly,
  *     the right plan for a small side, instead of exploding one
  *     pathological year-long interval into thousands of bucket
  *     copies (the uncapped-fan-out failure mode q_basket_pairs' cap
  *     exists to prevent). Both branches re-read their inputs —
  *     DELIBERATE: in the common no-long-interval case the broadcast
  *     side is empty and AQE's empty-relation propagation prunes the
  *     whole branch (union included) at runtime, so its probe scan
  *     never executes (spec-pinned: final plan = exactly two scans);
  *     a localCheckpoint here would force a materialization of the
  *     full probe to pay for a branch that usually dies.
  *
  * At 100 TB the bucket key has cardinality (time span / bucketWidth)
  * — years of data at minutes-wide buckets give millions of distinct
  * keys, so the equi-join shuffles evenly; a burst hour is an AQE
  * skew-join case like any hot key, never a plan change. Output
  * volume equals the true match count — irreducible.
  */
object IntervalJoin {

  /** Exact floor division of a named long column (`/` on longs makes a
    * double, which silently loses ulps past 2^53). `c − pmod(c, w)` is
    * the exact multiple `w·⌊c/w⌋` (pmod's remainder is non-negative),
    * so the truncating integral `div` recovers the floor exactly, in
    * pure long arithmetic, for negative times too. Shared with the
    * streaming face ([[graft.streaming.Streaming.intervalMatches]]) so
    * the two faces' bucket math can never drift apart. */
  private[graft] def floorDiv(name: String, w: Long): Column =
    expr(s"(`$name` - pmod(`$name`, ${w}L)) div ${w}L")

  /** @param probe          rows to locate inside intervals
    * @param probeTime      long time column on `probe`
    * @param intervals      rows carrying `[startCol, endCol)` bounds
    * @param startCol       long inclusive lower bound on `intervals`
    * @param endCol         long exclusive upper bound on `intervals`;
    *                       rows with end ≤ start match nothing
    * @param keys           (probeKey, intervalKey) equi-pairs required
    *                       to match in addition to containment; empty
    *                       = pure range join (bucket is the only
    *                       equi-key)
    * @param bucketWidth    time-bucket width in the time columns' unit
    * @param maxSpanBuckets intervals covering more buckets than this
    *                       take the broadcast path
    * @return inner join: all `probe` columns ++ all `intervals`
    *         columns (names must be disjoint) */
  def overlap(probe: DataFrame, probeTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keys: Seq[(String, String)], bucketWidth: Long,
      maxSpanBuckets: Int = 4): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxSpanBuckets >= 1, "maxSpanBuckets must be >= 1")
    val pCols = probe.columns.toSeq
    val iCols = intervals.columns.toSeq
    require(pCols.intersect(iCols).isEmpty,
      s"probe/interval column names must be disjoint, both have: " +
        pCols.intersect(iCols).mkString(","))
    require(!(pCols ++ iCols).exists(_.startsWith("__iv_")),
      "__iv_ prefix is reserved for IntervalJoin working columns")

    // floorDiv via exact integer arithmetic: end is exclusive, so the
    // last covered bucket is floorDiv(end - 1).
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__iv_em1", col(endCol) - 1)
      .withColumn("__iv_b0", floorDiv(startCol, bucketWidth))
      .withColumn("__iv_b1", floorDiv("__iv_em1", bucketWidth))
      .drop("__iv_em1")
    val outCols = (pCols ++ iCols).map(col)
    val range = col(probeTime) >= col(startCol) &&
      col(probeTime) < col(endCol)
    val keyConds = keys.map { case (pk, ik) => col(pk) === col(ik) }
    val p = probe.withColumn("__iv_bp", floorDiv(probeTime, bucketWidth))

    val short = iv.filter(col("__iv_b1") - col("__iv_b0") < maxSpanBuckets)
      .withColumn("__iv_bucket", explode(sequence(col("__iv_b0"), col("__iv_b1"))))
    val shortPairs = p.join(short,
        (keyConds :+ (col("__iv_bp") === col("__iv_bucket")) :+ range)
          .reduce(_ && _))
      .select(outCols: _*)

    val longTail = iv.filter(col("__iv_b1") - col("__iv_b0") >= maxSpanBuckets)
      .drop("__iv_b0", "__iv_b1")
    val longPairs = probe.join(broadcast(longTail),
        (keyConds :+ range).reduce(_ && _))
      .select(outCols: _*)

    shortPairs.unionByName(longPairs)
  }
}
