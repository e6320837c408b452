package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-proof equi-join — the join member of the salting trio
  * ([[SaltedAgg]] for aggregates, [[SaltedWindow]] for rankings): a
  * hot join key (one domain owning half the crawl, one user owning
  * half the event stream) lands every matching probe row in ONE
  * shuffle partition of a shuffled join. Salting fans the probe side
  * out over `buckets` sub-partitions of the same key and replicates
  * the build side once per bucket, so the hot key's rows spread over
  * `buckets` tasks while the join result is EXACTLY the plain join
  * (the DuckDB oracle replays the unsalted spelling — the driver's
  * hash gate is a plan-equivalence proof).
  *
  * When to reach for it, given that AQE's OptimizeSkewedJoin already
  * splits oversized partitions at runtime: (1) Structured Streaming
  * joins, where AQE does not run and a hot key is fatal for the
  * stream's lifetime; (2) plans where the skewed join feeds a
  * same-key stage (AQE declines to split when splitting would insert
  * an extra shuffle); (3) deterministic capacity planning — salt
  * width is part of the reviewed plan, not a runtime heuristic.
  *
  * Cost model: build side shuffles ×`buckets` (explode) — use it when
  * the build side is far smaller than the probe side but too large or
  * too skewed to broadcast whole; probe rows are salted by a
  * DETERMINISTIC hash of a caller-named unique column (never rand():
  * retries and oracle comparison need bit-stable placement).
  */
object SaltedJoin {

  /** `probe ⋈ build` on `key` (inner), probe fanned out over
    * `buckets` via `xxhash64(saltSrc) mod buckets`, build replicated
    * per bucket with an in-row sequence explode. `saltSrc` must be a
    * probe column with high cardinality (a unique id is ideal —
    * uniformity, not uniqueness, is what matters). Output columns =
    * plain join's. */
  def join(probe: DataFrame, build: DataFrame, key: String,
      saltSrc: String, buckets: Int = 32): DataFrame = {
    require(buckets > 0)
    // a pre-existing '_salt' column would be silently replaced by the
    // working column and dropped from the output — refuse instead of
    // corrupting the result relative to the plain join
    require(!probe.columns.contains("_salt") && !build.columns.contains("_salt"),
      "SaltedJoin uses an internal '_salt' working column; rename the " +
        "existing '_salt' column on the input first")
    val p = probe.withColumn("_salt",
      pmod(xxhash64(col(saltSrc)), lit(buckets.toLong)).cast("int"))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
