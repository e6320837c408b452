package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of every graft session-scoped function
  * (`graft_bloom_agg`/`graft_might_contain`, the KLL sketch family,
  * `graft_top_k_by`, and the ArrayMath pair).
  *
  * Why this exists: the per-module helpers register lazily on
  * `SparkSession.getActiveSession`, which is the session of the THREAD,
  * not necessarily the session the returned Column will be ANALYZED in.
  * With a single session the two always coincide; in a multi-session
  * app (e.g. `spark.newSession()` for an isolated conf, exactly what
  * DeterminismSpec does) a query built against session B from a thread
  * whose active session is A fails analysis with UNRESOLVED_ROUTINE.
  * [[graft.Tables.load]] calls this with the session every query
  * explicitly receives, so any query built through the table loaders is
  * self-registering on its own session. Each module's `register` is
  * guarded (WeakHashMap + functionExists probe), so the per-load cost
  * is a few map lookups. */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    Bloom.register(spark)
    KllSketch.register(spark)
    CmsSketch.register(spark)
    TopKBy.register(spark)
    ArrayMath.register(spark)
    StringSimilarity.register(spark)
  }
}
