package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain mixing — the composition-control op of a training-data
  * pipeline: given a target corpus mix ("40% web, 30% books, 30%
  * code"), select the LARGEST deterministic subset whose per-source
  * composition hits the target exactly (up to integer rounding).
  *
  * Mechanics: with `share_s` in permille and `n_s` observed rows per
  * source, the largest feasible output size is
  * `O = min_s(n_s * 1000 div share_s)` (any larger and some source
  * would need more rows than it has); each source then contributes the
  * first `O * share_s div 1000` of its rows ordered by a portable
  * multiplicative hash of the row key. Everything is integer
  * arithmetic and hash-ordering, so the selection is a pure function
  * of the data — reproducible across engines, re-runs, and partition
  * layouts, and replayable verbatim as a SQL oracle.
  *
  * Scale shape: one tiny per-source aggregate (partial-aggregable;
  * #sources rows), a broadcast join of the per-source quotas, and one
  * row_number window PARTITIONED BY SOURCE. A skewed source makes a
  * big window partition — same co-location any per-source op needs;
  * for a pathological single-source corpus, pre-split the source
  * label upstream. No driver-side row materialization anywhere.
  */
object DomainMix {

  /** Portable multiplicative hash (same overflow discipline as the
    * sampling tier): (key % 1000003) * 2654435761 ≤ ~2.7e15 — safe in
    * 64-bit ANSI arithmetic in Spark and DuckDB alike. */
  def portableBucket(key: Column): Column =
    ((key % lit(1000003L)) * lit(2654435761L)) % lit(1000000L)

  /** Resample `df` to the target mix. Sources absent from
    * `sharePermille` are dropped; a zero or negative share is rejected
    * (drop the key from the map instead). A target source with ZERO
    * observed rows makes the only composition-honoring output the
    * EMPTY set, and that is what comes back — the share map is the
    * spine of the per-source count join, so missing sources count as
    * n_s = 0 rather than silently vanishing from the feasibility cap.
    * `keyCol` must be a unique integral row key — it seeds the hash
    * order and breaks ties deterministically. */
  def resample(df: DataFrame, sourceCol: String, keyCol: String,
      sharePermille: Map[String, Long]): DataFrame = {
    require(sharePermille.values.sum == 1000L,
      s"target shares must sum to 1000 permille: $sharePermille")
    require(sharePermille.values.forall(_ > 0), "zero/negative share — drop the key instead")
    val spark = df.sparkSession
    import spark.implicits._
    val shareTable = sharePermille.toSeq.toDF(sourceCol, "_share")
    // #target-sources rows, share map as the JOIN SPINE (absent source
    // → n_s = 0 → cap 0 → empty output, the only feasible mix);
    // eagerly checkpointed because BOTH the cap aggregate and the
    // quota projection read it — a plain persist would leak a cached
    // frame per call (the checkpoint's RDD blocks are reaped by the
    // ContextCleaner once the frame goes out of scope)
    val counts = shareTable.join(
        df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n_s")),
        Seq(sourceCol), "left")
      .na.fill(0L, Seq("_n_s"))
      .localCheckpoint(true)
    // largest feasible output size: a 1-row aggregate of the tiny
    // per-source frame, cross-joined back (broadcast both ways)
    val cap = counts.agg(min(expr("(_n_s * 1000) div _share")).as("_o"))
    val quotas = counts.crossJoin(broadcast(cap))
      .withColumn("_take", expr("(_o * _share) div 1000"))
      .select(col(sourceCol), col("_take"))
    val ranked = df.withColumn("_rk",
      row_number().over(Window.partitionBy(col(sourceCol))
        .orderBy(portableBucket(col(keyCol)), col(keyCol))))
    ranked.join(broadcast(quotas), Seq(sourceCol))
      .filter(col("_rk") <= col("_take"))
      .drop("_rk", "_take")
  }

  /** Exact integer square root, `floor(√n)`: the double `sqrt` is
    * correctly rounded (IEEE 754) but `floor` of it can still land one
    * off when √n sits within an ulp of an integer, so both neighbours
    * are checked with pure 64-bit integer arithmetic. Every engine that
    * follows IEEE sqrt + 64-bit ints computes the identical value —
    * which is what lets a temperature-weighted selection hash-check
    * against a SQL twin (a float weight normalization would die on
    * summation order). */
  def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val s1 = when((s0 + 1) * (s0 + 1) <= n, s0 + 1).otherwise(s0)
    when(s1 * s1 > n, s1 - 1).otherwise(s1)
  }

  /** SQL twin of [[isqrt]] over an expression string. */
  def isqrtSql(e: String): String = {
    val s0 = s"CAST(floor(sqrt(CAST(($e) AS DOUBLE))) AS BIGINT)"
    s"""(CASE WHEN ($s0 + 1) * ($s0 + 1) <= ($e) THEN $s0 + 1
       |      WHEN $s0 * $s0 > ($e) THEN $s0 - 1 ELSE $s0 END)""".stripMargin.replace("\n", " ")
  }

  /** Temperature-scaled resampling (α = 1/2) — the tail-upweighting mix
    * rule of multilingual/pretraining pipelines (sampling probability ∝
    * count^α, T5 §3.4.3 / XLM §3.1): source s receives
    * `budget · isqrt(n_s) div Σ isqrt(n_t)` rows (never more than n_s),
    * chosen per source in portable-hash order. α = 1/2 is computed as an
    * EXACT integer square root, and the normalization is an integer sum
    * of ≤ #sources terms — no float accumulates anywhere, so the whole
    * selection replays verbatim in the SQL oracle.
    *
    * Scale shape: identical to [[resample]] — a per-source count
    * aggregate, a broadcast quota join, one per-source window.
    *
    * `budget` is an aggregate Column evaluated over the per-source
    * count frame (per-source row counts visible as `_n_s`) — use
    * [[corpusFraction]] for the usual "1/k of the corpus" budget. */
  def resampleTemperature(df: DataFrame, sourceCol: String, keyCol: String,
      budget: Column): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n_s"))
      .withColumn("_w", isqrt(col("_n_s")))
      .localCheckpoint(true) // read by both the total and the quotas
    require(counts.columns.contains("_n_s"), "internal frame contract")
    val total = counts.agg(sum(col("_w")).as("_tw"), budget.as("_budget"))
    val quotas = counts.crossJoin(broadcast(total))
      .withColumn("_take", least(col("_n_s"),
        expr("(_budget * _w) div _tw")))
      .select(col(sourceCol), col("_take"))
    val ranked = df.withColumn("_rk",
      row_number().over(Window.partitionBy(col(sourceCol))
        .orderBy(portableBucket(col(keyCol)), col(keyCol))))
    ranked.join(broadcast(quotas), Seq(sourceCol))
      .filter(col("_rk") <= col("_take"))
      .drop("_rk", "_take")
  }

  /** Budget of `corpus rows div den`, as an aggregate over the
    * per-source count frame of [[resampleTemperature]]. */
  def corpusFraction(den: Long): Column = expr(s"sum(_n_s) div $den")
}
