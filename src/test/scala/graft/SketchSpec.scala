package graft

import org.apache.spark.sql.functions._

/** Mergeable HLL sketch tier (q_sketch_distinct): error bound vs exact,
  * exact merge associativity, and the persist→reload→union round-trip
  * that makes the tier incremental at 100 TB.
  */
class SketchSpec extends SparkSpec {

  test("per-source and union estimates within 5% of exact") {
    val out = graft.queries.ExtraQueries.qSketchDistinct(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sf001)
      .select(col("source"), xxhash64(col("text")).as("h"))
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("h")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.keySet.subsetOf(out.keySet))
    exact.foreach { case (src, n) =>
      val est = out(src)
      assert(math.abs(est - n) <= math.max(0.05 * n, 2),
        s"$src: est $est vs exact $n")
    }
    // the union row (composite estimator — HIP is lost on merge, see
    // qSketchDistinct doc) still bounds against the exact global count
    val wholeExact = docs.agg(countDistinct(col("h"))).head().getLong(0)
    assert(math.abs(out("__all__") - wholeExact) <= math.max(0.05 * wholeExact, 2),
      s"union row ${out("__all__")} vs exact $wholeExact")
  }

  test("theta overlap estimates bound against exact set sizes") {
    val row = graft.queries.ExtraQueries.qSketchOverlap(spark, sf001).head()
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
    val train = docs.filter(col("doc_id") % 2 === 0).select(col("h")).distinct()
    val ev = docs.filter(col("doc_id") % 2 === 1).select(col("h")).distinct()
    val nTrain = train.count(); val nEval = ev.count()
    val nOverlap = ev.intersect(train).count()
    val nUnion = ev.union(train).distinct().count()
    def ok(est: Long, exact: Long, what: String): Unit =
      assert(math.abs(est - exact) <= math.max(0.05 * exact, 3),
        s"$what: est $est vs exact $exact")
    ok(row.getLong(0), nTrain, "train")
    ok(row.getLong(1), nEval, "eval")
    ok(row.getLong(2), nOverlap, "overlap")
    ok(row.getLong(3), nUnion, "union")
    ok(row.getLong(4), nEval - nOverlap, "eval_only")
  }

  test("sketches persist to parquet, reload, and union incrementally") {
    val docs = Tables.documents(spark, sf001)
      .select(col("source"), xxhash64(col("text")).as("h"))
    val dir = TempDirs.create("graft_hll_").toString
    // day 1: persist per-source sketches (a few KB — not the rows)
    docs.groupBy(col("source"))
      .agg(expr("hll_sketch_agg(h)").as("sk"))
      .write.mode("overwrite").parquet(dir)
    // later: union the persisted sketches with a fresh scan's sketch,
    // never re-reading day 1's rows
    val reloaded = spark.read.parquet(dir)
    val merged = reloaded.agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    // union estimates via the composite estimator (HIP lost on merge),
    // so compare against the exact count with the error bound, and
    // against a re-run of the same union for determinism
    val exact = docs.agg(countDistinct(col("h"))).head().getLong(0)
    assert(math.abs(merged - exact) <= math.max(0.05 * exact, 2),
      s"persisted union $merged vs exact $exact")
    val again = spark.read.parquet(dir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    assert(merged == again, "union estimate must be deterministic")
  }

  // ---- KLL quantile sketch tier (q_sketch_quantiles) ----

  /** KLL's contract is on RANK, not value: the returned value's exact
    * normalized rank must be within ε of the requested rank. ε(k=200)
    * ≈ 1.65% at 99% confidence; compaction is randomized, so assert at
    * 2ε to keep the spec deterministic in practice. */
  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("kll quantiles within the normalized rank-error bound vs exact") {
    val out = graft.queries.ExtraQueries.qSketchQuantiles(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap
    val lens = Tables.documents(spark, sf001)
      .select(length(col("text")).cast("double")).collect().map(_.getDouble(0)).sorted
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(graft.functions.KllSketch.DefaultK, false)
    val all = out("__all__")
    assert(all.getLong(1) == lens.length && all.getLong(2) == lens.length,
      "kll_n must be exact through merge")
    Seq(0.10 -> 3, 0.50 -> 4, 0.90 -> 5, 0.99 -> 6).foreach { case (p, i) =>
      val est = all.getDouble(i)
      assert(lens.contains(est), s"p$p estimate $est must be an input member")
      assert(math.abs(rankOf(lens, est) - p) <= 2 * eps + 1.0 / lens.length,
        s"p$p: value $est has exact rank ${rankOf(lens, est)}")
    }
  }

  test("kll sketches persist to parquet, reload, and merge incrementally") {
    import graft.functions.KllSketch._
    val docs = Tables.documents(spark, sf001)
      .select(col("source"), length(col("text")).cast("double").as("len"))
    val dir = TempDirs.create("graft_kll_").toString
    // day 1: persist per-source sketch blobs (KB each, not the rows)
    docs.groupBy(col("source")).agg(kllSketchAgg(col("len")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    // later: merge the persisted blobs — no re-scan of day 1's rows
    val merged = spark.read.parquet(dir)
      .agg(kllMergeAgg(col("sk")).as("sk"))
      .select(kllN(col("sk")), kllQuantile(col("sk"), 0.5)).head()
    val lens = docs.select(col("len")).collect().map(_.getDouble(0)).sorted
    assert(merged.getLong(0) == lens.length, "merged N must be exact")
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(graft.functions.KllSketch.DefaultK, false)
    assert(math.abs(rankOf(lens, merged.getDouble(1)) - 0.5) <= 2 * eps + 1.0 / lens.length,
      s"merged p50 ${merged.getDouble(1)} outside rank bound")
  }

  test("bounds oracle rows: both sketch property gates emit their literal all-true frames") {
    // these are the driver-visible twins of the spec bounds above — the
    // DuckDB oracle generates the literal frame, so any false here is a
    // red driver row, not just a red spec
    val ad = graft.queries.ExtraQueries.qApproxDistinctBounds(spark, sf001).collect()
    assert(ad.map(_.getString(0)).toSeq ==
      Seq("l_orderkey", "l_partkey", "l_quantity"))
    assert(ad.forall(_.getBoolean(1)), ad.mkString(", "))
    val kq = graft.queries.ExtraQueries.qSketchQuantileBounds(spark, sf001).collect()
    assert(kq.map(_.getString(0)).toSeq == Seq("p10", "p50", "p90", "p99"))
    assert(kq.forall(_.getBoolean(1)), kq.mkString(", "))
  }

  test("kll empty-group and null handling: empty sketch yields NULL quantile") {
    import graft.functions.KllSketch._
    import spark.implicits._
    val df = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("g", "v")
    val row = df.groupBy(col("g")).agg(kllSketchAgg(col("v")).as("sk"))
      .select(kllN(col("sk")).as("n"), kllQuantile(col("sk"), 0.5).as("q"))
      .orderBy(col("n")).head()
    assert(row.getLong(0) == 0L, "null values must not rank")
    assert(row.isNullAt(1), "empty sketch quantile must be NULL")
  }

  test("cms: estimates >= exact and within eps*N under forced collisions; persist->reload->merge == monolithic") {
    import graft.functions.CmsSketch._
    import spark.implicits._
    // 500 distinct items into a deliberately TINY sketch (eps=0.2 →
    // width 10) so collisions are guaranteed and the ≥ / ≤ eps·N band
    // is exercised where it bites, not where the sketch is exact
    val eps = 0.2
    val rows = (1 to 500).map(i => (s"item_${i % 100}", (i % 7) + 1L, i % 4))
    val df = rows.toDF("item", "w", "part")
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = rows.map(_._2).sum
    val mono = df.agg(cmsSketchAgg(col("item"), col("w"), eps).as("sk"))
      .head().getAs[Array[Byte]](0)
    val monoSk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(mono))
    assert(monoSk.totalCount() == n)
    var sawOver = false
    exact.foreach { case (item, ex) =>
      val est = monoSk.estimateCount(item)
      assert(est >= ex, s"$item undercounted: $est < $ex")
      assert(est <= ex + (eps * n).toLong + 1, s"$item out of band: $est vs $ex")
      if (est > ex) sawOver = true
    }
    assert(sawOver, "collision regime not reached — the band assert is vacuous")
    // persist per-part blobs to parquet, reload, merge: byte-identical
    // to the monolithic sketch (counter arrays add exactly)
    val dir = TempDirs.create("cms-roundtrip").toString
    df.groupBy(col("part")).agg(cmsSketchAgg(col("item"), col("w"), eps).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(cmsMergeAgg(col("sk")).as("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, mono),
      "merged-from-parts blob must be byte-identical to the monolithic sketch")
    // weighted fold == per-row fold (counts add)
    val perRow = df.as[(String, Long, Int)].flatMap { case (i, w, p) =>
      Seq.fill(w.toInt)((i, 1L, p)) }.toDF("item", "w", "part")
      .agg(cmsSketchAgg(col("item"), col("w"), eps).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(perRow, mono),
      "tf-weighted adds must equal per-occurrence adds")
    // merge over zero blobs is NULL (the geometry lives in the blobs,
    // so there is nothing valid to return); null items must not count
    val emptyMerge = spark.read.parquet(dir).where(lit(false))
      .agg(cmsMergeAgg(col("sk")).as("sk")).head()
    assert(emptyMerge.isNullAt(0), "empty merge must be NULL")
    val nulls = Seq((Option.empty[String], 1L)).toDF("item", "w")
      .agg(cmsSketchAgg(col("item"), col("w"), eps).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(nulls)).totalCount() == 0L,
      "null items must not count")
  }
}
