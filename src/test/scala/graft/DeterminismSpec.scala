package graft

import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.types._

/** The in-JVM half of COVERAGE.md's float-determinism recipe, run as a
  * registration gate: every HASH-GATED query that emits a floating
  * column must produce BIT-IDENTICAL output when the input's physical
  * layout moves. The driver's DuckDB hash compare is bit-exact, so any
  * float that shifts when partial-aggregation order shifts is a red
  * driver row waiting to happen — exactly the r12 q_rolling_anomaly /
  * q_seasonal_decompose failure class, where unrounded order-sensitive
  * aggregates were registered on the (false) premise of a tolerant
  * driver compare.
  *
  * Two perturbations are applied TOGETHER on the second run:
  *   1. a second session with different `spark.sql.shuffle.partitions`
  *      and a 128 KB `spark.sql.files.maxPartitionBytes`;
  *   2. a ROW-REORDERED, MULTI-FILE copy of every harness table
  *      (repartition(7) on a full-row hash + sortWithinPartitions) —
  *      the perturbation that actually bites: the sf parquet files are
  *      single-row-group, so conf changes alone never move scan-side
  *      partial order (measured — the r12 red seasonal spelling is
  *      bit-stable under perturbation 1 alone at sf0.001 AND sf0.01,
  *      but flips under the reordered copy at both).
  *
  * Layout-order sensitivity is NECESSARY but not sufficient for
  * hash-green (cross-engine frame-iteration order can differ even when
  * Spark is self-consistent — r12's stddev_samp ulp); the sufficient
  * half is `scripts/check_oracle.py --strict`, which runs DuckDB and
  * stays a dev-loop tool. Together they are the COVERAGE.md recipe.
  */
class DeterminismSpec extends SparkSpec {

  private def hasFloat(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ArrayType(e, _)        => hasFloat(e)
    case StructType(fs)         => fs.exists(f => hasFloat(f.dataType))
    case MapType(k, v, _)       => hasFloat(k) || hasFloat(v)
    case _                      => false
  }

  test("hash-gated float-emitting queries are bit-identical under a reordered layout and second partitioning") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "5")
    alt.conf.set("spark.sql.files.maxPartitionBytes", "131072")

    // Deterministically reordered + resharded copy of the harness dir:
    // same multiset of rows, different file assignment and in-file
    // order, so scan-side partial aggregation runs in a genuinely
    // different order. Built once per suite run.
    val reordered = TempDirs.create("determinism-reorder").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$sf001/$t.parquet")
      val h = xxhash64(df.columns.map(col): _*)
      df.repartition(7, h).sortWithinPartitions(h)
        .write.mode("overwrite").parquet(s"$reordered/$t.parquet")
    }

    // Hash-gated (oracled) AND emits a floating column. Schema
    // resolution is lazy for DataFrame-composition queries; ops with a
    // documented build budget hit their BuildTimes cache here and again
    // in the runs below, so construction cost is paid once.
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(SparkEntry.oracleSql.contains)
      .filter { n =>
        SparkEntry.queries(n)(spark, sf001).schema.exists(f => hasFloat(f.dataType))
      }
    assert(names.nonEmpty, "candidate enumeration must not be vacuous")
    info(s"sweeping ${names.size} float-emitting hash-gated queries")

    // Row.toString round-trips doubles through Double.toString, which is
    // injective on bit patterns (canonical NaN, and 0.0 vs -0.0 render
    // differently) — sorted string multisets compare bit-exact output
    // independent of tie order. Queries run on a small pool (the
    // Verify.scala rationale: the scheduler interleaves their jobs
    // across the local executor threads, halving wall-clock).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val bad =
      try Await.result(Future.traverse(names) { n => Future {
        val a = SparkEntry.queries(n)(spark, sf001).collect().map(_.toString).sorted
        val b = SparkEntry.queries(n)(alt, reordered).collect().map(_.toString).sorted
        if (a.length == b.length && a.indices.forall(i => a(i) == b(i))) None else Some(n)
      }}, Duration.Inf).flatten
      finally pool.shutdown() // a throwing query must not leak the pool's non-daemon threads
    assert(bad.isEmpty,
      s"layout-sensitive float output (would go hash-red at the driver): ${bad.mkString(", ")}")
  }
}
