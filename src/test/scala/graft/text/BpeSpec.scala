package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE (Sennrich et al., ACL'16, alg. 1) on a word-freq
    * map: count adjacent symbol pairs weighted by word freq, merge the
    * most frequent (ties: lexicographic), repeat. */
  private def referenceBpe(wordFreq: Map[String, Long],
      numMerges: Int): Seq[(String, String, Long)] = {
    var vocab = wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        vocab = vocab.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), f)
        }
        k += 1
      }
    }
    out.result()
  }

  test("learned merges match the in-memory reference on a handcrafted corpus") {
    // classic BPE example shape: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    val docs = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest"))
      .flatten.mkString(" ")
    val df = Seq(docs).toDF("text")
    val got = Bpe.learnMerges(df, numMerges = 8)
      .map(m => (m.left, m.right, m.pairCount))
    val want = referenceBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(got == want, s"got=$got want=$want")
  }

  test("merge application is left-to-right non-overlapping (aaa + (a,a) -> [aa, a])") {
    val df = Seq("aaa aaa").toDF("text")
    val got = Bpe.learnMerges(df, numMerges = 2).map(m => (m.left, m.right, m.pairCount))
    // round 1: (a,a) appears twice per 'aaa' sliding, weighted 2 words -> 4;
    // the reference counts overlapping slides too, so both sides must agree
    val want = referenceBpe(Map("aaa" -> 2L), 2)
    assert(got == want, s"got=$got want=$want")
  }

  test("early exhaustion: single-char vocabulary stops before numMerges") {
    val df = Seq("a b c a b").toDF("text")
    assert(Bpe.learnMerges(df, numMerges = 5).isEmpty)
  }

  test("hybrid: distributed loop == in-memory loop on the harness corpus") {
    // maxDriverWords = 0 forces the distributed per-merge path; the
    // default takes the collect-when-small path — the merge tables must
    // be identical (same data, same tie-break, same replacement order)
    val docs = graft.Tables.documents(spark, sf001).limit(200)
    val fast = Bpe.learnMerges(docs, numMerges = 12)
    val dist = Bpe.learnMerges(docs, numMerges = 12, maxDriverWords = 0L)
    assert(fast == dist, s"fast=$fast dist=$dist")
  }

  test("early exhaustion on the in-memory path too") {
    val df = Seq("a b c a b").toDF("text")
    // in-memory path is the default; force it explicitly for clarity
    assert(Bpe.learnMerges(df, numMerges = 5,
      maxDriverWords = Bpe.DefaultMaxDriverWords).isEmpty)
  }

  test("encodeWord: greedy lowest-rank merges with a handcrafted table") {
    val rank = Map(("l", "o") -> 0, ("lo", "w") -> 1, ("e", "r") -> 2)
    assert(Bpe.encodeWord("low", rank).toSeq == Seq("low"))
    assert(Bpe.encodeWord("lower", rank).toSeq == Seq("low", "er"))
    assert(Bpe.encodeWord("wool", rank).toSeq == Seq("w", "o", "o", "l"))
    assert(Bpe.encodeWord("", rank).toSeq == Seq())
    assert(Bpe.encodeWord("x", Map.empty[(String, String), Int]).toSeq == Seq("x"))
  }

  test("greedy encode == rank-order replay of the learned merges on the harness vocab") {
    // replay applies merges strictly in rank order (the training
    // loop's own application); greedy picks the lowest rank present.
    // On words from the training corpus both must land on the
    // training end-state — divergence would mean the encoder does not
    // reproduce the tokenizer it claims to apply.
    def replay(word: String, merges: Seq[Bpe.Merge]): Seq[String] = {
      var s = word.map(_.toString).toVector
      merges.foreach { m =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == m.left && s(i + 1) == m.right) {
            out += (m.left + m.right); i += 2
          } else { out += s(i); i += 1 }
        }
        s = out.result()
      }
      s
    }
    val docs = graft.Tables.documents(spark, sf001).select($"text")
    val merges = Bpe.learnMerges(docs, numMerges = 30)
    val rank = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val vocab = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.text.TextAnalysis.tokens($"text")).as("w"))
      .filter($"w" =!= "").distinct().as[String].collect()
    vocab.foreach { w =>
      assert(Bpe.encodeWord(w, rank).toSeq == replay(w, merges),
        s"greedy != replay for word '$w'")
    }
  }

  test("frozen packing tokenizer: table re-learnable from sf0.01, replay spelling == greedy encoder on the full vocab") {
    import org.apache.spark.sql.functions._
    val frozen = graft.queries.TextQueries.FrozenMerges
    // provenance: the pinned artifact IS learnMerges(sf0.01, 16) —
    // if the testdata corpus ever regenerates differently this fails
    // loudly and the constant gets re-frozen
    val learned = Bpe.learnMerges(
      graft.Tables.documents(spark, sf01).select($"text"), numMerges = 16)
    assert(learned.map(m => (m.rank, m.left, m.right)) ==
      frozen.map(m => (m.rank, m.left, m.right)),
      "frozen merge table drifted from the sf0.01 corpus artifact")
    // the oracle's sequential-replay spelling (doubled 
    // separators, one replace per merge in rank order) must equal the
    // real greedy encoder on every harness word — the exact twin of
    // qPackBlocksTokens' DuckDB piece-count expression
    val rank = frozen.map(m => (m.left, m.right) -> m.rank).toMap
    def replayPieces(w: String): Int = {
      val S = ""; val D = S + S
      var s = D + w.map(_.toString).mkString(D) + D
      frozen.sortBy(_.rank).foreach { m =>
        s = s.replace(S + m.left + D + m.right + S, S + m.left + m.right + S)
      }
      s.count(_ == '') / 2 - 1
    }
    val vocab = Seq(sf001, sf01, "/root/testdata/sf0.1").map { d =>
      graft.Tables.documents(spark, d)
        .select(explode(graft.text.TextAnalysis.tokens($"text")).as("w"))
        .filter($"w" =!= "").distinct().as[String].collect().toSet
    }.reduce(_ ++ _)
    assert(vocab.nonEmpty)
    vocab.foreach { w =>
      assert(Bpe.encodeWord(w, rank).length == replayPieces(w),
        s"replay spelling diverged from greedy on '$w'")
    }
  }

  test("q_bpe_encode: piece counts bounded by tokens below and chars above") {
    val out = graft.queries.TextQueries.qBpeEncode(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tokens, pieces) = (r.getLong(1), r.getLong(2))
      assert(pieces >= tokens, "every word is at least one piece")
    }
  }

  test("q_bpe_train on the harness corpus: 10 ranked merges, counts non-increasing") {
    val out = graft.queries.TextQueries.qBpeTrain(spark, sf001).collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(0)).toSeq == (0 until 10))
    val counts = out.map(_.getLong(4))
    // merge counts are non-increasing ONLY per fixed pair universe; a
    // merge can create a new high-frequency pair, so assert positivity
    // and determinism instead
    assert(counts.forall(_ > 0))
    val again = graft.queries.TextQueries.qBpeTrain(spark, sf001).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "merge table must be deterministic across runs")
  }
}
