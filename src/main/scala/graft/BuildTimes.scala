package graft

/** Wall-clock registry for one-time, process-cached build costs (model
  * fits, the IVF index). The memoizing operators report their cache
  * MISS duration here, so Bench can emit a `builds` section next to
  * the per-query steady-state numbers — amortization is the documented
  * contract for those operators, but a regression in the build itself
  * must stay visible (ADVICE r3).
  */
object BuildTimes {

  private val times = new java.util.concurrent.ConcurrentHashMap[String, Double]

  /** Run `f`, recording its duration under `name` (last write wins —
    * one build per (process, scale dir) means one record in practice). */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    times.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Builds recorded so far, sorted by name. */
  def snapshot: Seq[(String, Double)] =
    scala.jdk.CollectionConverters.MapHasAsScala(times).asScala.toSeq.sortBy(_._1)
}
