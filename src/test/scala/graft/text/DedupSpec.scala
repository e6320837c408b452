package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.DedupQueries

class DedupSpec extends SparkSpec {

  import DedupQueries.IdOffset

  test("shingles: k-grams with short-document guard") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq("a b")) // shorter than k -> whole text
  }

  test("exact dedup: every planted copy collapses to its original keeper") {
    val out = DedupQueries.qDedupExact(spark, sf001).collect()
    assert(out.length == 500) // one group per distinct text
    assert(out.forall(_.getAs[Long]("n_copies") == 2))
    assert(out.forall(_.getAs[Long]("keeper") < IdOffset)) // original wins
  }

  test("incremental dedup: seen-set hits die, fresh content survives once, min id wins") {
    val out = DedupQueries.qDedupIncremental(spark, sf001).collect()
      .map(_.getLong(0)).toSet
    // 500 docs: verbatim copies (+1*off) all die; of the two identical
    // perturbed copies (+2*off, +3*off), exactly the lower id survives
    assert(out.size == 500)
    (0L until 500L).foreach { i =>
      assert(!out.contains(i + IdOffset), s"verbatim copy $i survived the seen set")
      assert(out.contains(i + 2 * IdOffset), s"perturbed copy $i missing")
      assert(!out.contains(i + 3 * IdOffset), s"within-delta dup $i kept both")
    }
  }

  test("incremental dedup == batch exact dedup restricted to the delta") {
    import spark.implicits._
    // equivalence law: running the union through exactDedup and keeping
    // delta-side keepers must equal incremental over the same split
    val existing = Seq((0L, "a a"), (1L, "b b")).toDF("doc_id", "text")
    val delta = Seq((10L, "a a"), (11L, "c c"), (12L, "c c"), (13L, "d d"))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalExactDedup(
      existing.select(sha2(col("text"), 256).as("content_sha")), delta)
      .select("doc_id").as[Long].collect().toSet
    val batch = Dedup.exactDedup(existing.union(delta))
      .filter(col("keeper") >= 10L) // groups whose keeper is a delta row
      .select("keeper").as[Long].collect().toSet
    assert(inc == batch && inc == Set(11L, 13L))
  }

  test("simhash: fingerprints of near-identical docs are close, random pairs far") {
    val corpus = DedupQueries.corpusNear(spark, sf001)
    val fp = Dedup.simhash(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("simhash_hi"), r.getAs[Long]("simhash_lo")))).toMap
    def hamming(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // dropping one token from a short doc flips a handful of the 128
    // bits — near-dups land within ~14, far from the ~64 of random pairs
    val plantedDist = (0L until 100L).map(i => hamming(fp(i), fp(i + IdOffset)))
    assert(plantedDist.count(_ <= 14) >= 90, s"planted pairs too far: $plantedDist")
    // random non-pairs should be much farther on average
    val randomDist = (0L until 99L).map(i => hamming(fp(i), fp(i + 1)))
    assert(randomDist.sum.toDouble / randomDist.size > plantedDist.sum.toDouble / plantedDist.size)
  }

  test("simhash pairs: recall >= 0.9 on planted near-dups") {
    val pairs = DedupQueries.qDedupSimhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (0L until 500L).count(i => pairs.contains((i, i + IdOffset)))
    assert(hits >= 450, s"recall ${hits / 500.0}")
  }

  test("ngram jaccard pairs: high recall and planted pairs score near 1") {
    val out = DedupQueries.qDedupNgram(spark, sf001).collect()
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hits = (0L until 500L).flatMap(i => byPair.get((i, i + IdOffset)))
    assert(hits.size >= 450, s"recall ${hits.size / 500.0}")
    assert(hits.forall(_ >= 0.8))
  }

  test("ngram pairs: a planted stopword shingle changes no pairs and never funnels into one window task") {
    import spark.implicits._
    // 20 docs + 20 near-dup copies (last token dropped), EVERY doc
    // ending in the same three tokens — the pure-suffix shingle has
    // df = 40, far above the spec threshold of 5, while all other
    // shingles stay cold (df <= 2)
    def tokens(i: Long, n: Int) = (0 until n).map(t => s"u${i}x$t").mkString(" ")
    val docs = (0L until 20L).flatMap { i =>
      Seq((i, s"${tokens(i, 10)} zz yy xx"),
        (i + 100L, s"${tokens(i, 9)} zz yy xx"))
    }.toDF("doc_id", "text")
    // brute-force exact Jaccard over the unhashed shingle sets
    val sets = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if j >= 0.5
    } yield (a, b) -> j).toMap
    assert(expected.size == 20, "fixture must plant exactly the 20 near-dup pairs")

    val guarded = Dedup.ngramJaccardPairs(docs, 3, 0.5, "text", "doc_id",
      hotShingleDf = 5)
    val got = guarded.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet, "guard must not change the pair set")
    got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-9) }

    // plan shape: the window count runs over the COLD branch only (hot
    // rows filtered out before it) and hot rows attach via broadcast —
    // no window task ever owns a stopword shingle's full row set
    val logical = guarded.queryExecution.optimizedPlan.toString
    assert(logical.contains("isnull(hot_df"),
      "window input must exclude hot shingles")
    assert(guarded.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "hot df must attach via broadcast")

    // dormant guard (default threshold): identical output through the
    // original single-window plan
    val dormant = Dedup.ngramJaccardPairs(docs, 3, 0.5, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(dormant.keySet == expected.keySet)
    dormant.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-9) }
  }

  test("connected components: chain, triangle, and isolated pair resolve to min-id keepers") {
    import spark.implicits._
    // chain 1-2-3, triangle 10-11-12 (all three edges), pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedup clusters: planted pairs form 2-member components keyed by the original id") {
    val comp = DedupQueries.qDedupClusters(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every clustered perturbed copy shares its component with a doc
    // whose id is the component (the keeper is a real member)
    comp.foreach { case (_, c) => assert(comp(c) == c, s"keeper $c not its own component") }
    // planted pair (i, i+offset): when both are clustered at all, they
    // must be in the SAME component
    (0L until 500L).foreach { i =>
      (comp.get(i), comp.get(i + IdOffset)) match {
        case (Some(a), Some(b)) => assert(a == b, s"planted pair $i split: $a vs $b")
        case _ => ()
      }
    }
    // recall: nearly all planted pairs are clustered
    val hits = (0L until 500L).count(i => comp.contains(i + IdOffset))
    assert(hits >= 450, s"clustered ${hits / 500.0}")
  }

  test("editdist maxDist=0 degenerates to exact equality (FastSS identity signature)") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "abd")).toDF("doc_id", "title")
    val out = Dedup.editDistancePairs(df, maxDist = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 0)))
  }

  test("repeated spans: cross-document spans reported, intra-document repeats alone are not") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared tail one two three"),      // shares the 8-run with doc 2
      (2L, s"prefix $shared other stuff here"),
      (3L, s"$shared again $shared"),           // intra-doc repeat AND cross-doc
      (4L, "solo solo solo solo solo solo solo solo solo"), // intra-doc only
      (5L, "too short")).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(df, k = 8, minDocs = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the fully-shared window appears in docs 1, 2, 3 (twice in 3)
    assert(out(shared) == ((3L, 4L)))
    // doc 4's self-repeated window never reaches 2 DISTINCT docs
    assert(!out.keys.exists(_.startsWith("solo")))
    // windows overlapping doc-specific tokens stay doc-local
    assert(out.keys.forall(_.contains("w")))
  }

  test("quality keeper: argmax quality within each cluster, ties by min id, differs from min-id") {
    val out = DedupQueries.qDedupKeeperQuality(spark, sf001).collect()
    val byComp = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // recompute cluster membership + per-doc quality independently
    val corpus = DedupQueries.corpusNear(spark, sf001)
    val q = graft.text.TextAnalysis.withQualitySignals(corpus)
      .select(col("doc_id"), col("quality_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val comp = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(corpus, k = 3, minJaccard = 0.8))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val members = comp.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    members.foreach { case (c, ms) =>
      val (keeper, kq, n) = byComp(c)
      assert(n == ms.length, s"component $c member count")
      val best = ms.map(m => (q(m), -m)).max
      assert(keeper == -best._2, s"component $c keeper $keeper != argmax ${-best._2}")
      assert(math.abs(kq - q(keeper)) < 2e-9)
    }
    // the policy must actually diverge from min-id keeper selection on
    // this corpus, or the query demonstrates nothing
    assert(out.count(r => r.getLong(1) != r.getLong(0)) > 100,
      "keeper == component everywhere — policy indistinguishable from min-id")
  }

  test("minhash LSH pairs: recall >= 0.9 on planted near-dups, deterministic") {
    val a = DedupQueries.qDedupMinhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (0L until 500L).count(i => a.contains((i, i + IdOffset)))
    assert(hits >= 450, s"recall ${hits / 500.0}")
    val b = DedupQueries.qDedupMinhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b) // seeded LSH is reproducible
  }

  test("edit-distance pairs: planted mutants found at dist 1; gram-prefix candidates, no nested loop") {
    val out = DedupQueries.qDedupEditdist(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // every planted single-substitution mutant pairs with its base at
    // distance exactly 1 (titles are 24 chars; 'X' differs from the
    // lowercase original first char)
    (0L until 500L).foreach { i =>
      assert(out.get((i, i + IdOffset)).contains(1),
        s"planted mutant of $i: ${out.get((i, i + IdOffset))}")
    }
    // candidate generation is equi-joins (gram-prefix + short-string
    // length band) — a range/theta formulation would plan a nested loop
    val plan = DedupQueries.qDedupEditdist(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("edit-distance pairs: the short/long length boundary loses nothing (brute-force reference)") {
    import spark.implicits._
    // random strings with lengths 1..12 and a tiny alphabet — dense
    // true-pair structure including degenerate lengths (empty-adjacent,
    // single-char). Exercises the FastSS deletion-neighborhood path at
    // maxDist=2 (the r9 dispatch) end-to-end against brute force; the
    // gram path's own boundary behavior is covered by the low-entropy
    // guard test below, which calls editDistanceCandidates directly.
    val rnd = new scala.util.Random(3)
    val alpha = "abcd"
    val strs = (0L until 60L).map { i =>
      val n = 1 + rnd.nextInt(12) // lengths 1..12 straddle the threshold 9
      i -> (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val df = strs.toDF("doc_id", "title")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, ta) <- strs; (ib, tb) <- strs if ia < ib
      dist = lev(ta, tb) if dist <= 2
    } yield (ia, ib) -> dist).toMap
    val got = Dedup.editDistancePairs(df, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} extra=${(got.keySet -- expected.keySet).take(5)}")
  }

  test("editdist low-entropy guard: exact vs brute force, blow-up measured and bounded") {
    import spark.implicits._
    // Adversarial corpus for any gram-prefix scheme: 200 strings over
    // the two-letter alphabet {a,b} — only 8 possible 3-grams exist,
    // so every string's RAREST gram still appears in most of the
    // corpus and asc-df prefix ordering has nothing rare to pick.
    // Lengths spread 15..40 so the length band retains selectivity the
    // gram join cannot see.
    val rnd = new scala.util.Random(11)
    val bases = (0L until 120L).map { i =>
      val n = 15 + (i % 26).toInt
      i -> (0 until n).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    // plant near-pairs: 80 single-edit mutants (flip or delete) of the
    // first 80 bases — the pairs the operator must recover exactly
    val strs = bases ++ bases.take(80).map { case (i, t) =>
      val p = rnd.nextInt(t.length)
      val mutated =
        if (i % 2 == 0) t.updated(p, if (t(p) == 'a') 'b' else 'a')
        else t.substring(0, p) + t.substring(p + 1)
      (i + 1000L) -> mutated
    }
    val df = strs.toDF("doc_id", "title")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, ta) <- strs; (ib, tb) <- strs if ia < ib
      dist = lev(ta, tb) if dist <= 2
    } yield (ia, ib) -> dist).toMap
    assert(expected.nonEmpty) // fixture sanity: planted near-pairs exist
    // exactness WITH the guard firing (default dfCapFraction)
    val got = Dedup.editDistancePairs(df, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} extra=${(got.keySet -- expected.keySet).take(5)}")
    // blow-up, measured on the RAW candidate volume (the rows the
    // distinct shuffle pays for): dfCapFraction = 1.0 disables the
    // guard (no gram df can exceed N), 0.1 is the default
    val base = df.select(col("doc_id"), col("title"), length(col("title")).as("len"))
    val unguarded = Dedup.editDistanceCandidates(base, 2, 3, "title", "doc_id",
      dfCapFraction = 1.0, dedupe = false).count()
    val guarded = Dedup.editDistanceCandidates(base, 2, 3, "title", "doc_id",
      dfCapFraction = 0.1, dedupe = false).count()
    // the guard must route EVERY string here (all grams common), so
    // its raw volume is exactly the two-sided length-band volume —
    // computable from lengths alone; and the unguarded gram join must
    // measurably blow past it
    val lens = strs.map(_._2.length)
    val bandVolume = (for { la <- lens; lb <- lens if math.abs(la - lb) <= 2 } yield 1L).sum - lens.size
    assert(guarded == bandVolume,
      s"guard did not route all strings: raw=$guarded, band volume=$bandVolume")
    assert(unguarded > 3 * guarded,
      s"expected gram-join blow-up on low-entropy corpus: unguarded=$unguarded guarded=$guarded")
    // on the HIGH-entropy corpus of the brute-force test above, the
    // guard must not fire: candidates identical with it on and off
    val hi = (0L until 80L).map { i =>
      val n = 10 + rnd.nextInt(8)
      i -> (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val hiBase = hi.toDF("doc_id", "title")
      .select(col("doc_id"), col("title"), length(col("title")).as("len"))
    def pairSet(fr: Double) = Dedup.editDistanceCandidates(hiBase, 2, 3, "title", "doc_id",
      dfCapFraction = fr).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(0.1) == pairSet(1.0))
  }

  test("incremental minhash via persisted index == from-scratch pairs over the same corpus") {
    // the incremental run (history indexed+persisted to parquet, delta
    // banded fresh) must reproduce exactly the full run's delta-touching
    // pairs — history↔history pairs (natural near-dups among the
    // originals, e.g. docs 0↔50 at sf0.001) are yesterday's output and
    // must NOT reappear
    val full = DedupQueries.qDedupMinhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = full.filter { case ((a, b), _) => a >= IdOffset || b >= IdOffset }
    assert(expected.size < full.size,
      "corpus must contain history-internal pairs for this test to bite")
    val inc = DedupQueries.qDedupIncrementalMinhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc.nonEmpty && inc.keySet == expected.keySet,
      s"pair sets differ: only-inc=${(inc.keySet -- expected.keySet).take(5)} " +
        s"only-expected=${(expected.keySet -- inc.keySet).take(5)}")
    inc.foreach { case (pair, jd) => assert(jd == expected(pair), s"$pair: $jd != ${expected(pair)}") }
  }

  test("sketch tiers vs exact tier: recall floors over the PPJoin pair set at sf0.1") {
    // Ground truth = the EXACT n-gram Jaccard tier (recall 1.0 by the
    // prefix-filter theorem), 6009 pairs on the sf0.1 near-dup corpus
    // (5000 planted + natural J>=0.8 pairs). Both sketches are
    // hash-seeded with no RNG, so the measured recalls are exactly
    // reproducible, not distribution tails:
    //  - minhash (16 hashes, 8 bands of 2): banding catch probability
    //    at J=0.8 is 1-(1-0.8^2)^8 ~ 0.9997 and the verify threshold
    //    (J >= 0.7) is looser than the truth set's 0.8 -> measured
    //    recall 1.0000; floor 0.98 leaves room for corpus regeneration.
    //  - simhash (hamming<=14 over 128 bits, 8x16-bit bands): banding
    //    recall is OR-amplified (1-(1-0.875^h)^8 — ~0.999 at the
    //    planted median h~4), and a true J>=0.8 pair may legitimately
    //    sit >14 bits apart (token weights, not set overlap), so
    //    recall vs a Jaccard truth set is a corpus property — floor
    //    re-measured for the r9 128-bit parameterization.
    val d = "/root/testdata/sf0.1"
    val corpus = DedupQueries.corpusNear(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairSet(Dedup.ngramJaccardPairs(corpus, k = 3, minJaccard = 0.8))
      assert(exact.size >= 5000, s"truth set collapsed: ${exact.size}")
      val mhRecall = exact.count(pairSet(Dedup.minhashPairs(corpus)).contains)
        .toDouble / exact.size
      assert(mhRecall >= 0.98, f"minhash recall $mhRecall%.4f < 0.98")
      val shRecall = exact.count(
        pairSet(Dedup.simhashPairs(corpus, maxHamming = 14, numBands = 8)).contains)
        .toDouble / exact.size
      assert(shRecall >= 0.95, f"simhash recall $shRecall%.4f < 0.95")
    } finally corpus.unpersist()
  }
}
