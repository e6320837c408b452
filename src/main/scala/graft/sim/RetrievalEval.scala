package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation — the eval harness every ANN/retrieval
  * pipeline runs between index builds: given a SYSTEM ranking and a
  * GOLD ranking (both `(query_id, rank, neighbor_id)`, rank 1-based,
  * ≤ k rows per query), emit per-query recall@k, MRR, DCG@k and
  * nDCG@k (graded relevance from the gold rank: rel = k+1 − gold_rank,
  * the standard "position in the exact top-k" gain).
  *
  * Per-query rows, never a corpus mean: recall/MRR are exact rationals
  * (ONE terminal division each — bit-identical cross-engine), and a
  * mean over queries of quantized rationals is exactly the r12
  * boundary-sit class the house bans; a consumer averages downstream.
  *
  * Floats: the log₂ discount divisors are LITERAL double constants
  * (same decimal text on both engines — no libm call whose last ulp
  * could differ between the JVM and DuckDB), so each DCG term is one
  * IEEE-exact division of an exact integer by a literal; the per-query
  * DCG sums ≤ k irrational terms (reorder error ~1e-16, round(6)
  * emission — the no-boundary-sit doctrine), and nDCG divides by the
  * constant ideal DCG before its own round(6).
  *
  * Scale shape: one equi-join of system to gold on (query, neighbor)
  * — both sides are (queries × k)-bounded frames, the expensive part
  * was producing them — then one partial-aggregable per-query groupBy.
  * Nothing here touches the corpus. */
object RetrievalEval {

  /** log₂(rank+1) for ranks 1..10 as literal constants. */
  val Log2Discount: Array[Double] = Array(
    1.0, 1.5849625007211562, 2.0, 2.321928094887362, 2.584962500721156,
    2.807354922057604, 3.0, 3.169925001442312, 3.321928094887362,
    3.4594316186372973)

  def idealDcg(k: Int): Double = {
    require(k >= 1 && k <= Log2Discount.length)
    (1 to k).map(i => (k + 1 - i).toDouble / Log2Discount(i - 1)).sum
  }

  private def discount(rankCol: Column, k: Int): Column =
    (1 to k).foldLeft(lit(Double.NaN)) { (acc, i) =>
      when(rankCol === i, lit(Log2Discount(i - 1))).otherwise(acc)
    }

  /** Per-query metrics frame: query_id, n_gold, hits, recall_at_k,
    * mrr, dcg, ndcg — sorted by query_id.
    *
    * Input contract ENFORCED, not just documented (r15 ADVICE): system
    * rows are filtered to rank ∈ [1, k] before anything else — a
    * caller handing a deeper ranking than it evaluates at (rank > k)
    * would otherwise feed [[discount]]'s NaN fallback and silently
    * corrupt dcg/ndcg (and the SQL twin's CASE would return NULL,
    * dropping terms). Truncating to the top-k prefix IS the @k
    * semantics, so over-deep input now evaluates correctly instead of
    * poisoning the metrics.
    *
    * Coverage contract (r16 ADVICE): metrics LEFT-join onto the gold
    * query set, so a query whose system rows ALL fall outside [1, k]
    * (a malformed or empty ranking) still surfaces — with hits = 0,
    * recall = 0, mrr = 0, dcg = 0 — instead of silently vanishing
    * from the eval report. Every gold query_id appears exactly once. */
  def evaluate(system: DataFrame, gold: DataFrame, k: Int): DataFrame = {
    val g = gold.select(col("query_id"), col("neighbor_id"),
      col("rank").as("gold_rank"))
    val joined = system
      .select(col("query_id"), col("rank").as("sys_rank"), col("neighbor_id"))
      .filter(col("sys_rank") >= 1 && col("sys_rank") <= k)
      .join(g, Seq("query_id", "neighbor_id"), "left")
    val rel = when(col("gold_rank").isNotNull,
      (lit(k + 1) - col("gold_rank")).cast("double")).otherwise(lit(0.0))
    val nGold = g.groupBy(col("query_id")).agg(count(lit(1)).as("n_gold"))
    val metrics = joined
      .withColumn("term", rel / discount(col("sys_rank"), k))
      .groupBy(col("query_id"))
      .agg(
        count(when(col("gold_rank").isNotNull, 1)).as("hits"),
        min(when(col("gold_rank").isNotNull, col("sys_rank"))).as("fr"),
        sum(col("term")).as("dcg_raw"))
    nGold.join(metrics, Seq("query_id"), "left")
      .select(col("query_id"), col("n_gold"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_gold"))
          .as("recall_at_k"),
        coalesce(lit(1.0) / col("fr"), lit(0.0)).as("mrr"),
        round(coalesce(col("dcg_raw"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("dcg_raw"), lit(0.0)) / lit(idealDcg(k)), 6)
          .as("ndcg"))
      .orderBy(col("query_id"))
  }
}
