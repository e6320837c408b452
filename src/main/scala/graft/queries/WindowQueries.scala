package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function operators (SURVEY.md §2.6) over the harness tables.
  *
  * Scale: window partitions are per-user / per-supplier — one shuffle on
  * the partition key, then a per-partition sort; no global ordering is
  * ever required. Skewed partition keys would be the bottleneck at
  * 100 TB; the partition counts here (users, suppliers) are uniform by
  * construction, and AQE handles residual skew.
  */
object WindowQueries {

  // ---------------------------------------------------------------- §2.6 W1
  /** `lead` next-row label (ref ipynb c24:2-8: lead over
    * partitionBy(stn).orderBy(date)). Next ROW, not next timestamp —
    * gaps become multi-step leads, exactly like the reference
    * (SURVEY §7.4.1). Ordering is made total with the unique event_id
    * tie-break so results are deterministic under hashing. */
  def qWindowLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("value"),
        col("next_value"), col("next_type"))
      .orderBy(col("event_id"))
  }

  val qWindowLeadSql: String =
    """SELECT event_id, user_id, value,
      |  lead(value, 1) OVER w AS next_value,
      |  lead(event_type, 1) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- §2.6 W2
  /** Sliding ±k ROWS frame average (ref ipynb c16:80-87: the proximity
    * imputer's `avg over rowsBetween(-k, k)`). ROWS, not RANGE — the
    * frame is neighbors-by-position, matching the reference's
    * "days"-named-but-rows-implemented semantics (SURVEY §7.4.1). */
  def qWindowRowsAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, 7)
    Tables.events(s, d)
      .withColumn("smoothed", avg(col("value")).over(w))
      .select(col("event_id"), col("user_id"), col("value"), col("smoothed"))
      .orderBy(col("event_id"))
  }

  val qWindowRowsAvgSql: String =
    """SELECT event_id, user_id, value,
      |  avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING) AS smoothed
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- ranking + running
  /** Ranking + running total per partition — row_number/rank/dense_rank
    * and a cumulative sum (engine surface beyond the reference's two
    * window ops; same shuffle profile). */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    // (l_orderkey, l_linenumber, l_suppkey, l_partkey) is the unique key
    // of the harness lineitem — l_partkey in the window sort makes the
    // per-partition order total, so rn/running_qty are deterministic.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rn") <= lit(5))
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val qWindowRankSql: String =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity, running_qty
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    row_number() OVER w AS rn,
      |    sum(l_quantity) OVER (PARTITION BY l_suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
      |) t
      |WHERE rn <= 5
      |ORDER BY l_suppkey, rn""".stripMargin

  /** NTILE decile binning of orders by total price — the
    * quantile-bucketing primitive behind stratified splits and
    * difficulty binning. The unique o_orderkey in the window sort makes
    * bin assignment total across engines; output is the per-bin
    * profile, so the result stays 10 rows at any scale.
    *
    * Scale note: a global NTILE is a single total sort (range
    * partitioner at cluster scale). For 100 TB you'd switch to
    * approx_percentile cut-points + a broadcast bin lookup — same
    * output contract, no total sort; this exact form is the oracle
    * tier. */
  def qNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        avg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("decile"))
  }

  val qNtileSql: String =
    """SELECT decile, count(*) AS n,
      |  min(o_totalprice) AS lo, max(o_totalprice) AS hi,
      |  avg(o_totalprice) AS avg_price
      |FROM (
      |  SELECT o_orderkey, o_totalprice,
      |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders
      |) t
      |GROUP BY decile
      |ORDER BY decile""".stripMargin

  /** Time-RANGE sliding window (vs [[qWindowRowsAvg]]'s ROWS frame):
    * per user, the count and average of `value` over the trailing 10
    * minutes of EVENT TIME — neighbors-by-timestamp, not by position,
    * so irregular event spacing changes the frame size row to row.
    * The RANGE frame makes ties deterministic by construction: rows
    * sharing a timestamp share one frame, so no tie-break column is
    * needed. Same scale shape as every per-user window: one shuffle on
    * user_id, per-partition sort. */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-600000000L, 0L) // trailing 10 min in micros
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("n_10m", count(lit(1)).over(w))
      .withColumn("avg_10m", avg(col("value")).over(w))
      .select(col("event_id"), col("user_id"), col("value"),
        col("n_10m"), col("avg_10m"))
      .orderBy(col("event_id"))
  }

  val qWindowRangeSql: String =
    """SELECT event_id, user_id, value,
      |  count(*) OVER w AS n_10m,
      |  avg(value) OVER w AS avg_10m
      |FROM (SELECT *, epoch_us(ts) AS us FROM events) t
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Approximate decile binning — the 100 TB tier of [[qNtile]].
    * One `approx_percentile` pass (GK sketch: mergeable, bounded memory,
    * partial-aggregable) yields the 9 interior cut-points as a single
    * row; each order then gets its bin from a broadcast of that row —
    * `1 + |{cuts strictly below price}|` — so NO total sort and no
    * single-task window anywhere in the plan. Same output contract as
    * the exact tier (10 rows of per-bin profile); bin populations differ
    * from exact NTILE only by sketch error at the boundaries (and exact
    * NTILE splits ties across bins where a cut-point rule cannot), which
    * is why this registers rows-only and [[qNtile]] stays the oracle
    * tier. WindowQueriesSpec asserts per-bin counts within ε of exact
    * at sf0.1. */
  def qNtileApprox(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    val cuts = orders.agg(
      expr("approx_percentile(o_totalprice, " +
        "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000)").as("cuts"))
    orders.crossJoin(broadcast(cuts))
      .withColumn("decile", size(filter(col("cuts"), c => c < col("o_totalprice"))) + 1)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        avg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("decile"))
  }

  /** Value-navigation window family — first_value / last_value /
    * nth_value / lag over the per-user event timeline (lead is W1):
    * each event annotated with its user's first event value, the
    * running latest, the 3rd overall, and the previous one. All four
    * share ONE window spec → Catalyst evaluates them in a single
    * window operator over a single user_id shuffle (no per-function
    * pass). The frame is pinned explicitly: last_value over the
    * default RANGE frame would read the CURRENT row, not the
    * partition's last — the running form here is the deterministic,
    * streaming-equivalent reading. */
  def qWindowFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("first_v", first(col("value")).over(w))
      .withColumn("running_last_v", last(col("value")).over(w))
      .withColumn("third_v", nth_value(col("value"), 3).over(w))
      .withColumn("prev_v", lag(col("value"), 1)
        .over(Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .select(col("event_id"), col("user_id"), col("value"),
        col("first_v"), col("running_last_v"), col("third_v"), col("prev_v"))
      .orderBy(col("event_id"))
  }

  val qWindowFirstLastSql: String =
    """SELECT event_id, user_id, value,
      |  first_value(value) OVER w AS first_v,
      |  last_value(value) OVER w AS running_last_v,
      |  nth_value(value, 3) OVER w AS third_v,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Oracle row for the approx-quantile tier: [[qNtileApprox]] itself is
    * rows-only (the GK sketch's cut-points are engine-specific), but the
    * sketch's *rank-error contract* is exactly checkable — for the i-th
    * approximate decile cut, the true rank fraction
    * |{price ≤ cut_i}| / N must sit within ε of i/10. accuracy=10000
    * guarantees rank error ≤ N/10000; the check allows 10× that
    * (0.001). The result is deterministic when the contract holds — 9
    * rows of (i, true) — so the DuckDB twin generates that literal
    * frame and the driver's hash compare becomes the property's gate.
    *
    * One scan: the 9 true ranks are 9 conditional sums in a single
    * partial-aggregable pass against the broadcast cut-point row, then
    * posexplode of the 1-row result — no window, no sort, 100 TB-safe. */
  def qNtileApproxBounds(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d).select(col("o_totalprice"))
    val cuts = orders.agg(
      expr("approx_percentile(o_totalprice, " +
        "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000)").as("cuts"))
    val ranks = orders.crossJoin(broadcast(cuts)).agg(
      count(lit(1)).as("n"),
      (1 to 9).map(i => sum(when(col("o_totalprice") <=
        element_at(col("cuts"), i), 1L).otherwise(0L)).as(s"r$i")): _*)
    ranks
      .select(col("n"), posexplode(array((1 to 9).map(i => col(s"r$i")): _*)))
      .select((col("pos") + 1).as("i"),
        (abs(col("col") / col("n") - (col("pos") + 1) / lit(10.0)) <= 0.001)
          .as("within_bounds"))
      .orderBy(col("i"))
  }

  val qNtileApproxBoundsSql: String =
    // property-gate twin: a literal expected frame, NOT a recomputation —
    // the hash proves the Spark-side self-check's verdict, not values
    // (see scaladoc above; same contract as q_approx_distinct_bounds
    // and q_sketch_quantile_bounds)
    """SELECT CAST(r.range AS INT) AS i, true AS within_bounds
      |FROM range(1, 10) r ORDER BY i""".stripMargin

  /** Relative-rank functions — percent_rank and cume_dist per order
    * priority over order totals (the remaining members of the ranking
    * family; used for percentile-based labeling without a global
    * sort). o_orderpriority has only 5 values, so the naive
    * `PARTITION BY o_orderpriority` window is exactly the hot-group
    * shape [[graft.ops.SaltedWindow]] exists for: 5 window tasks each
    * sorting N/5 rows — a last-reducer at 100 TB. Instead both
    * functions are DERIVED from the two-level bucketed ranking: with
    * the unique o_orderkey tie-break the window ordering is total, so
    * `rank()` = `row_number()`, every peer group is a single row, and
    *   percent_rank = (rank − 1) / (n − 1)   (0 when n = 1)
    *   cume_dist   = rank / n
    * where (rank, n) come from
    * [[graft.ops.SaltedWindow.groupedRankWithTotal]] — a hot priority
    * fans out over `buckets` parallel sort tasks. The oracle replays
    * the naive percent_rank/cume_dist window spelling, so the
    * driver's hash gate is a plan-equivalence proof (same contract as
    * q_salted_rank); both divisions are the exact integer-operand IEEE
    * divisions DuckDB's own definitions perform, so the hash is safe. */
  def qWindowDist(s: SparkSession, d: String): DataFrame =
    graft.ops.SaltedWindow.groupedRankWithTotal(
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      "o_orderpriority", "o_totalprice", "o_orderkey",
      buckets = 64, ascending = true)
      .withColumn("pr",
        when(col("group_n") === 1, lit(0.0))
          .otherwise((col("rank") - 1) / (col("group_n") - 1)))
      .withColumn("cd", col("rank") / col("group_n"))
      .filter(col("o_orderkey") % 100 === 0) // bounded output at any SF
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"), col("pr"), col("cd"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))

  val qWindowDistSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, pr, cd FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |) t
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_dist" -> (qWindowDist _),
    "q_window_lead" -> (qWindowLead _),
    "q_window_firstlast" -> (qWindowFirstLast _),
    "q_window_rows_avg" -> (qWindowRowsAvg _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_range" -> (qWindowRange _),
    "q_ntile" -> (qNtile _),
    "q_ntile_approx" -> (qNtileApprox _),
    "q_ntile_approx_bounds" -> (qNtileApproxBounds _))

  val oracles: Map[String, String] = Map(
    "q_window_dist" -> qWindowDistSql,
    "q_window_lead" -> qWindowLeadSql,
    "q_window_firstlast" -> qWindowFirstLastSql,
    "q_window_rows_avg" -> qWindowRowsAvgSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_range" -> qWindowRangeSql,
    "q_ntile" -> qNtileSql,
    "q_ntile_approx_bounds" -> qNtileApproxBoundsSql)
}
