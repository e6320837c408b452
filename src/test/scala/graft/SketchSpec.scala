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
}
