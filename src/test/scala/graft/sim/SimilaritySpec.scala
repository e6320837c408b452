package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.{DedupQueries, SimilarityQueries}

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("cosine primitives: known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(
      Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("cos"),
      col("expected")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("brute force top-k: ranks are dense, cosines non-increasing, no self-match") {
    val out = SimilarityQueries.qSimBruteForce(spark, sf001).collect()
    assert(out.length == SimilarityQueries.NumQueries * SimilarityQueries.TopK)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to SimilarityQueries.TopK))
      val cosines = sorted.map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, s"query $qid not sorted")
      assert(rows.forall(_.getLong(2) != qid))
    }
  }

  test("IVF top-k recall@5 >= 0.6 vs brute force (prebuilt index, half the cells probed)") {
    val exact = SimilarityQueries.qSimBruteForce(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityQueries.qSimIvf(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF recall@5 >= 0.9 at sf0.1 with the default probe width (nCells/2)") {
    // Measured curve on the sf0.1 harness corpus (2000 uniform-random
    // vectors, nCells = 44 — IVF's worst case, no cluster structure):
    //   nProbe 11 (25%) → 0.78, 22 (50%) → 0.94, 33 (75%) → 0.98,
    //   38 (86%) → 1.00. Real clustered corpora reach the same recall
    //   at far smaller nProbe/nCells; qSimIvfProbe exposes the knob.
    val d = "/root/testdata/sf0.1"
    val exact = SimilarityQueries.qSimBruteForce(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val (_, centroids) = SimilarityQueries.ivfIndexFor(spark, d)
    val approx = SimilarityQueries.qSimIvfProbe(spark, d, centroids.size / 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall at nProbe=${centroids.size / 2}")
  }

  test("PQ top-k: ADC shortlist + exact re-rank recall@5 vs brute force, scores exact on hits") {
    val d = "/root/testdata/sf0.1"
    val exactRows = SimilarityQueries.qSimBruteForce(spark, d).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactCos = exactRows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approxRows = SimilarityQueries.qSimPqTopK(spark, d).collect()
    val approx = approxRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // uniform-random embeddings are quantization's worst case (no
    // manifold for the codebooks to learn) — the sublinear 2·k·√N
    // shortlist + exact re-rank still holds a 0.6 floor; measured
    // value recorded in the assert message for the curve's history
    assert(recall >= 0.6, s"PQ recall $recall")
    // wherever PQ returns a true neighbor, the EXACT re-rank must
    // reproduce the brute-force cosine bit-for-bit (both rounded 9)
    approxRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactCos.get(key).foreach(c =>
        assert(c == r.getDouble(3), s"re-ranked score differs on $key"))
    }
  }

  test("IVF-PQ top-k: cell-pruned ADC recall@5 vs brute force") {
    val d = "/root/testdata/sf0.1"
    val exact = SimilarityQueries.qSimBruteForce(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityQueries.qSimIvfPqTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // measured 0.88 at sf0.1 (half the cells probed, 2·k·√N
    // shortlist, uniform-random worst case); floor leaves margin
    assert(recall >= 0.6, s"IVF-PQ recall $recall")
  }

  test("PQ re-rank shortlist budget is sublinear in corpus size") {
    // the r9 N/10 rule re-ranked 10% of the corpus — a linear scan in
    // ANN costume. The 2·k·√N budget must grow ~10× (not 100×) per
    // 100× corpus growth, and stay far below any linear fraction.
    val k = SimilarityQueries.TopK
    val n0 = 2000L
    val s0 = SimilarityQueries.pqShortlist(n0, k)
    val s2 = SimilarityQueries.pqShortlist(n0 * 100, k)
    val s4 = SimilarityQueries.pqShortlist(n0 * 10000, k)
    assert(s2 <= 11 * s0, s"budget grew ${s2.toDouble / s0}x over 100x corpus")
    assert(s4 <= 11 * s2, s"budget grew ${s4.toDouble / s2}x over 100x corpus")
    // at 20M vectors the re-rank touches <0.3% of the corpus
    assert(s4.toDouble / (n0 * 10000) < 0.003)
  }

  test("embedding near-dup: scaled copies found as exact cosine-1 pairs") {
    val pairs = SimilarityQueries.qDedupEmbedding(spark, sf001).collect()
    val byPair = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val planted = (0L until 500L).flatMap(i => byPair.get((i, i + DedupQueries.IdOffset)))
    assert(planted.size >= 450, s"recall ${planted.size / 500.0}")
    planted.foreach(c => assert(c > 0.999999))
  }

  test("semantic dedup: scaled copies resolve to their base keeper; non-dups keep themselves") {
    val out = SimilarityQueries.qDedupSemantic(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 500L
    assert(out.size == 2 * n)
    // every planted copy must share its base's duplicate group: k-means
    // co-assigns identical normalized vectors, exact cosine = 1 links
    // them, CC labels the group by its min id (= the base id unless the
    // base itself is a near-dup of a smaller id)
    (0L until n).foreach { i =>
      assert(out(i + DedupQueries.IdOffset) == out(i),
        s"copy of $i: keeper ${out(i + DedupQueries.IdOffset)} != base keeper ${out(i)}")
    }
    // keepers are canonical: a keeper maps to itself
    out.values.toSet.foreach { k: Long => assert(out(k) == k, s"keeper $k not canonical") }
  }

  test("MMR: hand-computed tiny case — diversity breaks the redundant top-k") {
    // query = [1, 0]; ids 1/2 are near-copies of each other hugging the
    // query, 3 is orthogonal, 4 opposite. Rank 1 must be the most
    // relevant (tie on rounded rel broken by smaller id).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.999f, 0.0447f)),
      (2L, Array(0.999f, -0.0447f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(vecs.filter(col("vec_id") =!= 0),
      vecs.filter(col("vec_id") === 0), k = 3, lambda = 0.5).collect()
    val order = out.sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    assert(order.head == 1L, s"rank-1 must be the most relevant: $order")
    assert(order.toSet.size == 3, s"no repeats: $order")

    // decisive case: a diverse candidate with real relevance.
    // rel(1) = rel(2) ≈ 0.9990, cos(1,2) = 0.996003;
    // rel(3) = 0.8, cos(3,1) = 0.82602.
    val vecs2 = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.999f, 0.0447f)),   // rel ≈ 0.99900
      (2L, Array(0.999f, -0.0447f)),  // rel ≈ 0.99900, cos(1,2) ≈ 0.99600
      (3L, Array(0.8f, 0.6f))         // rel = 0.8, cos(3,1) ≈ 0.8259
    ).toDF("vec_id", "embedding")
    val out2 = Similarity.mmrTopK(vecs2.filter(col("vec_id") =!= 0),
      vecs2.filter(col("vec_id") === 0), k = 2, lambda = 0.5).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    // after picking 1 at λ=0.5: mmr(2) = 0.5·0.9990 − 0.5·0.9960 =
    // +0.0015 beats mmr(3) = 0.5·0.800 − 0.5·0.826 = −0.013 → {1, 2}.
    // At λ=0.1 the penalty dominates: mmr(2) = 0.0999 − 0.8964 =
    // −0.796 loses to mmr(3) = 0.080 − 0.743 = −0.663 → {1, 3}.
    val out3 = Similarity.mmrTopK(vecs2.filter(col("vec_id") =!= 0),
      vecs2.filter(col("vec_id") === 0), k = 2, lambda = 0.1).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    assert(out2 == Seq(1L, 2L), s"λ=0.5 keeps relevance order: $out2")
    assert(out3 == Seq(1L, 3L), s"λ=0.1 trades redundancy for diversity: $out3")
  }

  test("MMR on the harness corpus: rank 1 = brute-force rank 1, no dups, scores finite") {
    val mmr = SimilarityQueries.qSimMmr(spark, sf001).collect()
    assert(mmr.length == SimilarityQueries.TopK)
    val bf = SimilarityQueries.qSimBruteForce(spark, sf001).collect()
      .filter(_.getLong(0) == 0L).minBy(_.getInt(1))
    assert(mmr.head.getLong(1) == bf.getLong(2),
      "MMR's first pick must be the plain nearest neighbor")
    assert(mmr.map(_.getLong(1)).distinct.length == mmr.length)
    // mmr scores are non-increasing in rank: each later pick maximized
    // a criterion that only got harder
    val scores = mmr.sortBy(_.getInt(0)).map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, s"mmr scores not monotone: $scores")
  }

  test("MMR exhaustion guard: k beyond the candidate pool returns the picks so far, empty pool returns empty") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.999f, 0.0447f)),
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(vecs.filter(col("vec_id") =!= 0),
      vecs.filter(col("vec_id") === 0), k = 10, lambda = 0.5).collect()
    assert(out.length == 2, s"expected the 2 available picks, got ${out.length}")
    assert(out.map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    val empty = Similarity.mmrTopK(vecs.filter(col("vec_id") < 0),
      vecs.filter(col("vec_id") === 0), k = 3, lambda = 0.5).collect()
    assert(empty.isEmpty, "empty candidate pool must yield an empty frame, not a crash")
  }

  test("MMR over the IVF shortlist: trajectory identical to full-corpus MMR when the picks are covered") {
    // greedy-trajectory guarantee (qSimMmrShortlist doc): if every
    // full-corpus pick is inside the shortlist, the shortlisted greedy
    // run must reproduce the trajectory EXACTLY — same ids, same
    // scores, same order. Both facts are asserted: coverage (the
    // sublinear budget is wide enough on the harness corpus for a
    // rel-heavy λ) and equality.
    val full = SimilarityQueries.qSimMmr(spark, sf001).collect()
      .sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    val short = SimilarityQueries.qSimMmrShortlist(spark, sf001).collect()
      .sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(short == full,
      s"shortlisted MMR diverged from full-corpus MMR:\n$short\nvs\n$full")
  }

  test("incremental SemDeDup: fold == from-scratch batch over the same clustering; twins resolve") {
    val d = sf001
    val (ivfPath, localCentroids) = SimilarityQueries.ivfIndexFor(spark, d)
    val priorIndex = spark.read.parquet(ivfPath)
    val centroids = localCentroids.toDF("cell", "centroid")
    val delta = graft.Tables.embeddings(spark, d).select(
      (col("vec_id") + graft.queries.DedupQueries.IdOffset).as("vec_id"),
      transform(col("embedding"), x => x * 2.0f).as("embedding"))
    val assigned = Similarity.ivfAssign(delta, centroids).localCheckpoint(true)
    val priorKeepers = Similarity.semanticDedupFromIndex(priorIndex).localCheckpoint(true)
    val incremental = Similarity
      .semanticDedupIncrement(priorIndex, priorKeepers, assigned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch twin: from-scratch dedup over the SAME clustering (base
    // index ∪ frozen-centroid-assigned delta)
    val combined = priorIndex.select(col("vec_id"), col("cell"), col("norm"))
      .unionByName(assigned)
    val batch = Similarity.semanticDedupFromIndex(combined)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incremental.keySet == batch.keySet)
    assert(incremental == batch, {
      val diff = incremental.collect {
        case (k, v) if batch(k) != v => s"$k: inc=$v batch=${batch(k)}" }
      s"incremental diverges from batch on ${diff.size} ids: ${diff.take(5).mkString("; ")}"
    })
    // planted fact: every scaled copy resolves to its base twin's keeper
    val off = graft.queries.DedupQueries.IdOffset
    incremental.filter(_._1 >= off).foreach { case (id, keeper) =>
      assert(keeper == incremental(id - off),
        s"delta $id keeper $keeper != base twin keeper ${incremental(id - off)}")
    }
  }

  test("incremental IVF: assignment rule == KMeans.transform; scaled deltas mirror base cells") {
    val d = sf001
    val out = SimilarityQueries.qSimIvfIncremental(spark, d).collect()
    assert(out.nonEmpty)
    // scaled copies normalize to identical unit vectors → identical
    // nearest centroid → every cell's delta count equals its base count
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"cell ${r.getInt(0)}: base ${r.getLong(1)} != delta ${r.getLong(2)}")
    }
    val total = out.map(_.getLong(2)).sum
    assert(total == 500L, s"all 500 delta vectors assigned exactly once, got $total")
  }

  test("hybrid RRF: fused scores recompute from the leg ranks and order the output") {
    val out = SimilarityQueries.qHybridRrf(spark, sf001).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lex = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val vec = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(lex.isDefined || vec.isDefined, "a fused row needs at least one leg")
      val expected = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(4) == expected, s"rrf mismatch on $r")
    }
    // fused_rank 1..10 and rrf non-increasing along it
    assert(out.map(_.getInt(1)).toSeq == (1 to 10))
    val rrfs = out.sortBy(_.getInt(1)).map(_.getDouble(4)).toSeq
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    // a doc present in BOTH legs at rank r beats a doc in one leg at r:
    // verified implicitly by the formula; here pin that the top fused row
    // is at least as good as the best single-leg score
    assert(rrfs.head >= 1.0 / 61.0 || out.forall(r => r.isNullAt(2) || r.isNullAt(3)))
  }

  test("silhouette: per-point scores match a driver-side recomputation; assignment is the argmin") {
    val out = SimilarityQueries.qSimSilhouette(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    val (path, cents) = SimilarityQueries.ivfIndexFor(spark, sf001)
    val indexed = spark.read.parquet(path)
      .select(col("vec_id"), col("cell"), col("norm")).collect()
    assert(indexed.nonEmpty && out.size == indexed.length)
    indexed.foreach { r =>
      val (id, cell) = (r.getLong(0), r.getInt(1))
      val x = r.getSeq[Double](2)
      def dist(c: Seq[Double]): Double = {
        val cc = c.map(v => v * v).sum
        val xc = x.zip(c).map { case (a, b) => a * b }.sum
        math.sqrt(math.max(0.0, 1.0 + cc - 2.0 * xc))
      }
      val ds = cents.map { case (cl, c) => cl -> dist(c) }
      val a = ds.find(_._1 == cell).get._2
      val b = ds.filter(_._1 != cell).map(_._2).min
      assert(a <= b + 1e-9, s"vec $id assigned to a non-nearest cell")
      val s = (b - a) / math.max(a, b)
      val (gotCell, gotS) = out(id)
      assert(gotCell == cell)
      assert(math.abs(gotS - s) <= 1e-6, s"vec $id: $gotS vs $s")
      assert(gotS >= 0.0 && gotS <= 1.0)
    }
  }

  test("hard negatives: wrong-class only, and exactly the brute-force top-k with the label filter") {
    val out = SimilarityQueries.qHardNegatives(spark, sf001).collect()
    val labels = graft.Tables.embeddings(spark, sf001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(labels(n) != labels(q), s"same-class negative: $r")
      assert(r.getAs[Int]("n_label") == labels(n))
    }
    // driver-side brute force for one query
    val vecs = graft.Tables.embeddings(spark, sf001)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val (qid, qv, ql) = vecs.find(_._1 == 0L).get
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = vecs.filter(v => v._1 != qid && v._3 != ql)
      .map(v => (cos(qv, v._2), v._1)).sortBy { case (c, id) => (-c, id) }
      .take(5).map(_._2).toSeq
    val got = out.filter(_.getAs[Long]("query_id") == qid)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }
}
