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

  // ------------------------------------------------- df-capped tier

  // 10 train docs: all share the stop-trigram source "stop1 stop2
  // stop3" (df 10); each also has 12 unique tokens (10 unique
  // trigrams after the 2 boundary ones). Cap 5 -> the 3 header-zone
  // trigrams with df 10 are hot, everything touching unique tokens
  // stays.
  private def cappedTrain = (1 to 10).map { d =>
    (d.toLong, ("stop1 stop2 stop3 " +
      (1 to 12).map(i => s"d${d}u$i").mkString(" ")))
  }.toDF("doc_id", "text")

  test("dfCapShingleFrame: exact hot/kept split and accounting at a hand cap") {
    val idx = Dedup.dfCapShingleFrame(
      Dedup.literalShingleFrame(cappedTrain, 3, "train_id"), dfCap = 5)
    val hot = idx.hot.collect().map(r =>
      r.getAs[String]("sh") -> r.getAs[Long]("df")).toMap
    // only the one trigram present in all 10 docs crosses df > 5:
    // "stop1 stop2 stop3"; boundary trigrams ("stop2 stop3 dXu1",
    // "stop3 dXu1 dXu2") are per-doc unique
    assert(hot == Map("stop1 stop2 stop3" -> 10L))
    assert(idx.nDroppedShingles == 1L && idx.droppedMass == 10L)
    // kept = every (doc, sh) row except the hot one's 10 occurrences
    val totalRows = Dedup.literalShingleFrame(cappedTrain, 3, "train_id").count()
    assert(idx.kept.count() == totalRows - 10L)
    assert(idx.kept.filter($"sh" === "stop1 stop2 stop3").count() == 0L)
  }

  test("straddling plant: cap-aware denominator flags what the naive denominator misses") {
    // plant = the stop header + the first 6 unique tokens of doc 1,
    // prefixed by a novel marker: 10 tokens -> 8 distinct trigrams.
    // Hot drops 1 ("stop1 stop2 stop3"); of the surviving 7, the
    // marker trigram is novel and the other 6 are doc-1 trigrams:
    // capped containment 6/7 ≈ 0.857 >= 4/5; naive 6/8 = 0.75 < 4/5.
    val plant = ("mark0 stop1 stop2 stop3 " +
      (1 to 6).map(i => s"d1u$i").mkString(" "))
    val ev = Seq((100L, plant)).toDF("doc_id", "text")
    val idx = Dedup.dfCapShingleFrame(
      Dedup.literalShingleFrame(cappedTrain, 3, "train_id"), dfCap = 5)
    val capped = Dedup.containmentPairsFromCappedIndex(ev, idx).collect()
    assert(capped.length == 1)
    assert(capped.head.getAs[Long]("train_id") == 1L)
    assert(capped.head.getAs[Long]("n_eval_shingles") == 7L)
    assert(capped.head.getAs[Long]("n_shared") == 6L)
    // the naive spelling (kept index, full denominator) dilutes the
    // plant below threshold — zero rows
    assert(Dedup.containmentPairsFromIndex(ev, idx.kept).count() == 0L)
  }

  test("infinite cap reproduces the uncapped screen exactly") {
    val ev = Seq(
      (100L, "stop1 stop2 stop3 " + (1 to 9).map(i => s"d1u$i").mkString(" ")),
      (101L, (1 to 14).map(i => s"nov$i").mkString(" "))).toDF("doc_id", "text")
    val trainSh = Dedup.literalShingleFrame(cappedTrain, 3, "train_id")
    val inf = Dedup.containmentPairsFromCappedIndex(ev,
      Dedup.dfCapShingleFrame(trainSh, Long.MaxValue))
    val un = Dedup.containmentPairs(ev, cappedTrain)
    assert(inf.exceptAll(un).count() == 0L && un.exceptAll(inf).count() == 0L)
    assert(un.count() > 0L)
  }

  test("harness hot fixture: all eight capped-tier bounds hold at sf0.001") {
    val bounds = graft.queries.TextQueries
      .qContaminationCappedBounds(spark, sf001).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Boolean]("within_bounds"))
      .toMap
    assert(bounds.size == 8 && bounds.values.forall(identity), bounds.toString)
  }
}
