package graft

import graft.sim.RetrievalEval

/** Hand-computed fixtures for the ranked-retrieval metrics. */
class RetrievalEvalSpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(Long, Int, Long)]) =
    rows.toDF("query_id", "rank", "neighbor_id")

  test("a perfect system scores recall 1, MRR 1, nDCG exactly 1") {
    val gold = frame(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val m = RetrievalEval.evaluate(gold, gold, 3).collect()
    assert(m.length == 1)
    val r = m.head
    assert(r.getAs[Double]("recall_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("partial overlap matches the hand computation") {
    // gold: a@1 b@2 c@3; system: b@1 x@2 a@3 (k=3)
    // rel(b)=k+1-2=2 at discount log2(2)=1 -> 2.0
    // rel(a)=k+1-1=3 at discount log2(4)=2 -> 1.5; dcg=3.5
    val gold = frame(Seq((1L, 1, 100L), (1L, 2, 101L), (1L, 3, 102L)))
    val sys = frame(Seq((1L, 1, 101L), (1L, 2, 999L), (1L, 3, 100L)))
    val r = RetrievalEval.evaluate(sys, gold, 3).collect().head
    assert(r.getAs[Long]("hits") == 2L)
    assert(r.getAs[Double]("recall_at_k") == 2.0 / 3.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("dcg") == 3.5)
    val expNdcg = BigDecimal(3.5 / RetrievalEval.idealDcg(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ndcg") == expNdcg)
  }

  test("zero overlap scores zero everywhere, never null") {
    val gold = frame(Seq((1L, 1, 100L), (1L, 2, 101L)))
    val sys = frame(Seq((1L, 1, 200L), (1L, 2, 201L)))
    val r = RetrievalEval.evaluate(sys, gold, 2).collect().head
    assert(r.getAs[Long]("hits") == 0L)
    assert(r.getAs[Double]("recall_at_k") == 0.0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("dcg") == 0.0)
    assert(r.getAs[Double]("ndcg") == 0.0)
  }

  test("over-deep system input evaluates as top-k instead of NaN-poisoning DCG (r15 ADVICE)") {
    val gold = frame(Seq((1L, 1, 100L), (1L, 2, 101L), (1L, 3, 102L)))
    val sys = frame(Seq((1L, 1, 101L), (1L, 2, 999L), (1L, 3, 100L),
      (1L, 4, 102L), (1L, 5, 998L))) // ranks 4,5 beyond k=3
    val deep = RetrievalEval.evaluate(sys, gold, 3).collect().head
    val truncated = RetrievalEval.evaluate(
      frame(Seq((1L, 1, 101L), (1L, 2, 999L), (1L, 3, 100L))), gold, 3)
      .collect().head
    assert(deep.toString == truncated.toString,
      s"deep input must equal its own top-k prefix: $deep vs $truncated")
    assert(!deep.getAs[Double]("dcg").isNaN && !deep.getAs[Double]("ndcg").isNaN)
  }

  test("a query whose system rows are all rank > k still surfaces with zeros (r16 ADVICE)") {
    val gold = frame(Seq((1L, 1, 100L), (1L, 2, 101L),
      (2L, 1, 200L), (2L, 2, 201L)))
    // query 1 ranks normally; query 2's "ranking" starts past k —
    // malformed, previously vanished from the output entirely
    val sys = frame(Seq((1L, 1, 100L), (1L, 2, 999L),
      (2L, 7, 200L), (2L, 8, 201L)))
    val m = RetrievalEval.evaluate(sys, gold, 2).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(m.keySet == Set(1L, 2L), s"every gold query must appear: $m")
    val q2 = m(2L)
    assert(q2.getAs[Long]("hits") == 0L)
    assert(q2.getAs[Double]("recall_at_k") == 0.0)
    assert(q2.getAs[Double]("mrr") == 0.0)
    assert(q2.getAs[Double]("dcg") == 0.0)
    assert(q2.getAs[Double]("ndcg") == 0.0)
    assert(q2.getAs[Long]("n_gold") == 2L)
  }

  test("idealDcg matches the literal-constant discounts") {
    // k=3: 3/1 + 2/log2(3) + 1/2
    val exp = 3.0 / 1.0 + 2.0 / 1.5849625007211562 + 1.0 / 2.0
    assert(RetrievalEval.idealDcg(3) == exp)
  }
}
