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

  /** Water-filling token-budget allocation — the third mix rule, for
    * the case [[resample]] and [[resampleTemperature]] don't cover: a
    * FIXED token budget B must be spent in full across sources with
    * target weights w_s, but some sources are too small to supply
    * their proportional share. The classical answer (water-filling /
    * proportional fairness): allocate x_s = min(a_s, λ·w_s) with the
    * water level λ chosen so Σ x_s = B — small sources SATURATE (take
    * everything they have) and the freed budget redistributes across
    * the rest by weight.
    *
    * Closed form, in EXACT integer arithmetic end-to-end: sources
    * saturate in increasing a_s/w_s order, so sort by that ratio
    * (exact integer sort key `a_s · (LCM(w) div w_s)` — weights are
    * frozen small integers, so the multiplier is exact and overflow-
    * safe: at 100 TB, a_s ≈ 2.5e13 tokens × LCM ≤ a few hundred stays
    * far under 2^63), take inclusive prefix sums A_k / W_k, and test
    * each row k with `a_k·(W−W_k) ≤ w_k·(B−A_k)` — "if the first k
    * sources saturate, is row k consistent with its own water level".
    * The saturated set is the prefix before the first failing row
    * (WaterFillSpec proves this equals the iterative fixpoint on
    * randomized instances); unsaturated rows get `(w_s·(B−A_sat)) div
    * (W−W_sat)` — floored, so Σ allocated ≤ B with shortfall < the
    * number of unsaturated sources (the spec pins both invariants).
    * Every comparison and division is 64-bit integer, so the whole
    * allocation replays verbatim as a SQL oracle — no float water
    * level to drift.
    *
    * Scale shape: ONE partial-aggregable groupBy(source) over the
    * corpus (eagerly checkpointed — every later step reads the
    * per-source frame), then pure #sources-row algebra: the windows
    * below run on a single partition of ≤ #weights rows, the same
    * documented bounded-frame exemption as the Bradley–Terry win
    * matrix. Nothing corpus-sized moves after the first aggregate.
    *
    * `weights` is the frozen policy artifact (must be positive;
    * sources absent from the corpus stay on the spine with a_s = 0 and
    * saturate at zero). Budget is the scale-free fraction
    * `(Σ a_s · budgetNum) div budgetDen`. Returns (source, available,
    * weight, saturated, allocated). */
  def waterFill(df: DataFrame, sourceCol: String, tokenCol: String,
      weights: Map[String, Long], budgetNum: Long, budgetDen: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(budgetNum >= 0 && budgetDen > 0, "budget fraction")
    val lcmW = weights.values.reduce((a, b) => a / gcd(a, b) * b)
    val spark = df.sparkSession
    import spark.implicits._
    val wTab = weights.toSeq.toDF(sourceCol, "weight")
    // weight map as the join spine (missing source -> available 0);
    // checkpointed: the total aggregate AND the ranked frame read it
    val avail = wTab.join(
        df.groupBy(col(sourceCol))
          .agg(sum(col(tokenCol)).cast("long").as("available")),
        Seq(sourceCol), "left")
      .na.fill(0L, Seq("available"))
      .localCheckpoint(true)
    val tot = avail.agg(sum(col("available")).cast("long").as("_ta"),
      sum(col("weight")).cast("long").as("_tw"))
    val ord = Window.orderBy(col("_ord"), col(sourceCol))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tested = avail.crossJoin(broadcast(tot))
      .withColumn("_b", expr(s"(_ta * $budgetNum) div $budgetDen"))
      .withColumn("_ord", expr(s"available * (${lcmW}L div weight)"))
      .withColumn("_pos", row_number().over(ord))
      .withColumn("_ca", sum(col("available")).over(cum))
      .withColumn("_cw", sum(col("weight")).over(cum))
      .withColumn("_ok", col("available") * (col("_tw") - col("_cw")) <=
        col("weight") * (col("_b") - col("_ca")))
      .localCheckpoint(true) // read by the cut aggregate and the output
    val cut = tested.agg(min(when(!col("_ok"), col("_pos"))).as("_cut"))
    val flagged = tested.crossJoin(broadcast(cut))
      .withColumn("saturated", col("_cut").isNull || col("_pos") < col("_cut"))
      .localCheckpoint(true) // read by the water-level aggregate and the output
    val level = flagged.agg(
      sum(when(col("saturated"), col("available")).otherwise(0L))
        .cast("long").as("_sa"),
      sum(when(col("saturated"), col("weight")).otherwise(0L))
        .cast("long").as("_sw"))
    flagged.crossJoin(broadcast(level))
      .withColumn("allocated", when(col("saturated"), col("available"))
        .otherwise(expr("(weight * (_b - _sa)) div (_tw - _sw)")))
      .select(col(sourceCol), col("available"), col("weight"),
        col("saturated"), col("allocated"))
  }

  /** The selection [[waterFill]]'s allocation drives: per source, take
    * documents in portable-hash order while the inclusive token cumsum
    * stays within the allocated budget (a deterministic PREFIX — the
    * first overflowing document ends the source's intake even if a
    * later smaller one would fit; that greedy-prefix rule is what
    * replays exactly in SQL). Saturated sources take everything;
    * rows from sources absent from the weight map are dropped
    * (ineligible for the mix).
    *
    * Scale shape: [[waterFill]]'s one corpus aggregate + tiny-frame
    * algebra, then ONE per-source row_number/cumsum window over the
    * corpus and a broadcast quota join — the same co-location
    * [[resample]] needs. */
  def waterFillSelect(df: DataFrame, sourceCol: String, keyCol: String,
      tokenCol: String, weights: Map[String, Long],
      budgetNum: Long, budgetDen: Long): DataFrame = {
    val quotas = waterFill(df, sourceCol, tokenCol, weights,
        budgetNum, budgetDen)
      .select(col(sourceCol), col("allocated"))
    val ord = Window.partitionBy(col(sourceCol))
      .orderBy(portableBucket(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens",
        sum(col(tokenCol).cast("long")).over(ord))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("cum_tokens") <= col("allocated"))
      .select(col(keyCol), col(sourceCol),
        col(tokenCol).cast("long").as(tokenCol), col("cum_tokens"))
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}
