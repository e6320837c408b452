package graft.text

import graft.SparkSpec

/** The motivating fixture for the containment tier (r17 verdict
  * directive 1): an eval benchmark spliced INSIDE a ~10× train page —
  * symmetric Jaccard ≈ |eval|/|train| (invisible to the J ≥ 0.7 fuzzy
  * MinHash gate, proven here as a negative control), eval-side
  * containment = 1.0 (every eval trigram is a train trigram because
  * the splice is contiguous). */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  private val evalToks = (1 to 15).map(i => s"eval$i")
  // 70 + 15 + 70 = 155 distinct tokens -> 153 distinct train trigrams
  private val trainText =
    ((1 to 70).map(i => s"page$i") ++ evalToks ++
      (1 to 70).map(i => s"tail$i")).mkString(" ")

  test("embedded eval: Jaccard < 0.2 yet containment = 1.0, and only the host page flags") {
    val train = Seq(
      (2L, trainText),
      (4L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val ev = Seq((1L, evalToks.mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(ev, train).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("eval_id") == 1L)
    assert(r.getAs[Long]("train_id") == 2L)
    val nEval = r.getAs[Long]("n_eval_shingles")
    val nShared = r.getAs[Long]("n_shared")
    assert(nEval == 13L && nShared == 13L)
    assert(r.getAs[Double]("containment") == 1.0)
    // symmetric Jaccard of the planted pair: 13 / (13 + 153 - 13)
    val j = nShared.toDouble / (nEval + 153L - nShared)
    assert(j < 0.2, s"fixture drifted: J = $j")
  }

  test("negative control: the J >= 0.7 fuzzy MinHash tier misses the embedded eval") {
    val train = Seq((2L, trainText)).toDF("doc_id", "text")
    val ev = Seq((1L, evalToks.mkString(" "))).toDF("doc_id", "text")
    val (tb, ts) = Dedup.minhashIndex(train)
    val (eb, es) = Dedup.minhashIndex(ev)
    assert(Dedup.crossMinhashPairs(eb, es, tb, ts, maxJaccardDist = 0.3)
      .count() == 0L)
  }

  test("sub-threshold containment does not flag") {
    // 6 of 13 eval trigrams shared (tokens 1..8 of the eval prefix
    // appear verbatim; the rest novel) -> containment 6/13 < 0.8
    val partial = (evalToks.take(8) ++ (1 to 7).map(i => s"nov$i")).mkString(" ")
    val train = Seq((2L, trainText)).toDF("doc_id", "text")
    val ev = Seq((1L, partial)).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(ev, train).count() == 0L)
  }

  test("harness fixture: every planted embedded eval flags its source and the fuzzy tier flags none") {
    val bounds = graft.queries.TextQueries
      .qContaminationContainmentBounds(spark, sf001).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Boolean]("within_bounds"))
      .toMap
    assert(bounds.size == 6 && bounds.values.forall(identity), bounds.toString)
  }
}
