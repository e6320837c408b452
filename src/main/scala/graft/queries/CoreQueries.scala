package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator queries (SURVEY.md §2.1–§2.3, §2.5, §2.7,
  * §2.8, §2.11) over the harness tables, each paired with a DuckDB
  * oracle twin.
  *
  * Conventions (FIXTURES.md §B): every query ends in a total `orderBy`
  * over a unique key so the driver's hash compare is order-stable;
  * every computed column is aliased identically in the Spark expression
  * and the oracle SQL.
  *
  * Scale notes are given per query: these run on sf0.01 for the
  * correctness gate but are shaped for a 1000-executor cluster — single
  * shuffle on group keys, partial aggregation, filter/projection pushed
  * into the parquet scan.
  */
object CoreQueries {

  // ---------------------------------------------------------------- §2.5 A1
  /** TPC-H Q1-shaped pricing summary (ref ipynb c13:23-27, SURVEY §2.5 A1).
    * Partial (map-side) agg + one shuffle on a 6-value key: fully scalable.
    *
    * Floats (COVERAGE.md class-2, integer-exact spelling — r13): the
    * money columns are 2-decimal quantized, so price sums are carried
    * as INTEGER CENTS (`sum(round(x*100))` partial-aggregates exactly
    * in any order; the discounted sum's per-row term
    * `ec·(100−dc) ≤ ~10^9` keeps group sums ≪ 2^63 up to ~10^9 rows
    * per group — beyond that, switch the accumulator to DECIMAL(38,0),
    * the [[ExtraQueries.qCorr]] pattern) with ONE terminal division
    * per emitted column. `sum_qty`/`avg_qty` stay plain doubles:
    * quantities are integer-valued, so every partial sum is an exact
    * integer < 2^53 in ANY order, and the terminal divisions are IEEE-
    * deterministic. The r12 spelling (raw `sum(l_extendedprice)`) was
    * hash-green only by layout luck — DeterminismSpec's reordered-copy
    * sweep flips it. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        round(col("l_extendedprice") * lit(100)).cast("long").as("ec"),
        round(col("l_discount") * lit(100)).cast("long").as("dc"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(col("ec")).cast("double") / lit(100.0)).as("sum_base_price"),
        (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / lit(10000.0))
          .as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        (sum(col("dc")).cast("double") / (lit(100.0) * count(lit(1)))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(ec) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(sum(ec * (100 - dc)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  avg(l_quantity) AS avg_qty,
      |  CAST(sum(dc) AS DOUBLE) / (100.0 * count(*)) AS avg_disc,
      |  count(*) AS count_order
      |FROM (SELECT *, CAST(round(l_extendedprice * 100) AS BIGINT) AS ec,
      |        CAST(round(l_discount * 100) AS BIGINT) AS dc FROM lineitem)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- §2.1 S1 + §2.3
  /** Projection + range filter scan (ref ipynb c5:1 + §2.3 predicates).
    * Both the filter and the 4-column projection reach the parquet
    * reader (PushedFilters / ReadSchema) — verified in PlanSpec. */
  def qScanFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
      .filter(col("l_discount") > lit(0.05) && col("l_extendedprice") < lit(20000.0))
      // (l_orderkey, l_linenumber) is NOT unique in the harness data —
      // order by every output column for a hash-stable result.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))

  val qScanFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_discount > 0.05 AND l_extendedprice < 20000.0
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount""".stripMargin

  // ---------------------------------------------------------------- §2.2 P2/P6/P7/P8 + §2.9 X1
  /** Sentinel-nulling projection (ref ipynb c7:10-11: `when(col==sentinel,
    * null)`), plus cast (P6), lit (P7), month extraction (X1) and
    * constant fill (A9 `na.fill` as coalesce). Narrow, no shuffle. */
  def qProjectClean(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("value_clean",
        when(col("event_type") === lit("error"), lit(null)).otherwise(col("value")))
      .withColumn("value_filled", coalesce(col("value_clean"), lit(0.0)))
      .withColumn("user_str", col("user_id").cast("string"))
      .withColumn("mo", month(col("ts")))
      .select(col("event_id"), col("event_type"), col("value_clean"),
        col("value_filled"), col("user_str"), col("mo"))
      .orderBy(col("event_id"))

  val qProjectCleanSql: String =
    """SELECT event_id, event_type,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_clean,
      |  coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 0.0) AS value_filled,
      |  CAST(user_id AS VARCHAR) AS user_str,
      |  month(ts) AS mo
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- §2.3 F1 + §4.3.1
  /** Single-pass per-column missing count: replaces the reference's
    * 32-job `filter(isNull).count()` loop (ipynb c8:2) with ONE
    * aggregate job (SURVEY §4.3.1) — the fix that collapses the
    * reference's 20-minute profiling segment. */
  def qNullProbe(s: SparkSession, d: String): DataFrame = {
    val cleaned = Tables.events(s, d)
      .withColumn("value_clean",
        when(col("event_type") === lit("error"), lit(null)).otherwise(col("value")))
    // count(expr) skips nulls and yields BIGINT on both engines —
    // sum(CASE…) would be HUGEINT (int128) in DuckDB and hash-mismatch.
    cleaned.agg(
      count(when(col("value_clean").isNull, lit(1))).as("n_null_value"),
      count(col("value_clean")).as("n_notnull_value"),
      count(lit(1)).as("n_rows"))
  }

  // Oracle counts the SAME expression's nullness (error-typed rows OR
  // natively-null values), not a proxy predicate.
  val qNullProbeSql: String =
    """SELECT
      |  count(*) FILTER (WHERE (CASE WHEN event_type = 'error' THEN NULL ELSE value END) IS NULL) AS n_null_value,
      |  count(CASE WHEN event_type = 'error' THEN NULL ELSE value END) AS n_notnull_value,
      |  count(*) AS n_rows
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- §2.5 A1/A6
  /** Column-profile statistics: mean / sample stddev / exact distinct
    * (ref ipynb c13:23-27, c14:21). At 100 TB `countDistinct` becomes
    * `approx_count_distinct` (HLL) — kept exact here for oracle parity;
    * the approx variant is benchmarked separately in Bench. */
  def qStatsSummary(s: SparkSession, d: String): DataFrame = {
    // EXACT-moment spelling (r16 — the new sf0.1 rounded-class strict
    // leg caught mean_price's round-9 boundary-sitting under the
    // reordered layout at sf0.1, exactly the magnitude-dependence the
    // leg exists for): l_quantity is integer-valued and
    // l_extendedprice 2-decimal quantized, so all five moments are
    // exact integers and every emitted double is ONE terminal IEEE
    // tree spelled identically in the oracle — unrounded, the
    // q_corr/q_acf doctrine, instead of the round-9 bet this query
    // previously made. The Σc² cents moment (≈2.2e19 at sf0.1) passes
    // 2^63, and a DECIMAL/HUGEINT carry is NOT usable here: DuckDB's
    // HUGEINT→DOUBLE cast is one ulp off the correctly-rounded value
    // (measured on 22240711483861231690 → ...1230e19 vs IEEE
    // ...1234e19), so the moment is split into exact hi/lo LONG sums
    // (quotient/remainder by 10⁶ per row — both sums fit long through
    // sf1000) and reassembled in the terminal double tree, where
    // int64→double casts are correctly rounded on both engines. The
    // SMALLER sums (Σq, Σq², Σc — all fit BIGINT through sf1000) must
    // route through the same BIGINT cast in the oracle: DuckDB's
    // sum() over integers is HUGEINT regardless of magnitude, so an
    // unparenthesized CAST(sum(..) AS DOUBLE) would hit the defective
    // HUGEINT→DOUBLE path once the value outgrows 2^53 (r16 ADVICE —
    // Σc crosses around sf1+).
    val q = col("l_quantity").cast("long")
    val pc = round(col("l_extendedprice") * 100).cast("long")
    val moments = Tables.lineitem(s, d)
      .select(q.as("q"), pc.as("pc"), col("l_quantity"),
        col("l_partkey"), col("l_returnflag"))
      .withColumn("pc2", col("pc") * col("pc"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sq2"),
        sum(col("pc")).as("sp"),
        sum(expr("pc2 div 1000000")).as("sp2_hi"),
        sum(pmod(col("pc2"), lit(1000000L))).as("sp2_lo"),
        countDistinct(col("l_quantity")).as("nd_qty"),
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_returnflag")).as("nd_flag"))
    val n = col("n").cast("double")
    val sp2 = col("sp2_hi").cast("double") * 1000000 + col("sp2_lo").cast("double")
    def sd(s2: org.apache.spark.sql.Column, s1: org.apache.spark.sql.Column) =
      sqrt(greatest((s2 - s1.cast("double") * s1.cast("double") / n)
        / (n - 1), lit(0.0)))
    moments.select(
      (col("sq").cast("double") / n).as("mean_qty"),
      sd(col("sq2").cast("double"), col("sq")).as("sd_qty"),
      col("nd_qty"),
      (col("sp").cast("double") / (n * 100)).as("mean_price"),
      (sd(sp2, col("sp")) / 100).as("sd_price"),
      col("nd_part"),
      col("nd_flag"))
  }

  val qStatsSummarySql: String =
    """WITH r AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
      |    CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round(l_extendedprice * 100) AS BIGINT) AS pc2,
      |    l_quantity, l_partkey, l_returnflag
      |  FROM lineitem
      |), m AS (
      |  SELECT count(*) AS n,
      |    CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) AS sq,
      |    CAST(CAST(sum(q * q) AS BIGINT) AS DOUBLE) AS sq2,
      |    CAST(CAST(sum(pc) AS BIGINT) AS DOUBLE) AS sp,
      |    CAST(CAST(sum(pc2 // 1000000) AS BIGINT) AS DOUBLE) * 1000000
      |      + CAST(CAST(sum(pc2 % 1000000) AS BIGINT) AS DOUBLE) AS sp2,
      |    count(DISTINCT l_quantity) AS nd_qty,
      |    count(DISTINCT l_partkey) AS nd_part,
      |    count(DISTINCT l_returnflag) AS nd_flag
      |  FROM r
      |)
      |SELECT sq / n AS mean_qty,
      |  sqrt(greatest((sq2 - sq * sq / n) / (n - 1), 0.0)) AS sd_qty,
      |  nd_qty,
      |  sp / (n * 100) AS mean_price,
      |  sqrt(greatest((sp2 - sp * sp / n) / (n - 1), 0.0)) / 100 AS sd_price,
      |  nd_part, nd_flag
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- §2.5 A2/A3
  /** Exact global + grouped median (ref ipynb c16:14,17 — Spark 4
    * built-in `median`, no custom UDAF; SURVEY §7.3). Grouped by a
    * computed key (month of shipdate) like ipynb c16:135. */
  def qMedian(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("mo"))
      .agg(
        median(col("l_quantity")).as("med_qty"),
        median(col("l_extendedprice")).as("med_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("mo"))

  val qMedianSql: String =
    """SELECT l_returnflag, month(l_shipdate) AS mo,
      |  median(l_quantity) AS med_qty,
      |  median(l_extendedprice) AS med_price,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, month(l_shipdate)
      |ORDER BY l_returnflag, mo""".stripMargin

  // ---------------------------------------------------------------- §2.5 A5 + §2.7 O1
  /** Mode via group-count + sort + limit 1 (ref ipynb c13:33), with a
    * deterministic tie-break on the value itself. Catalyst compiles the
    * sort+limit to TakeOrderedAndProject — no global sort at scale. */
  def qMode(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type").asc)
      .limit(1)

  val qModeSql: String =
    """SELECT event_type, count(*) AS cnt
      |FROM events
      |GROUP BY event_type
      |ORDER BY cnt DESC, event_type ASC
      |LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- §2.5 A4
  /** Greenwald–Khanna approximate quantiles (ref ipynb c13:30 — the
    * EDA median — and c16:96 — the imputer fallback scalar; relErr
    * 0.001 matching c16:96). THE 100 TB quantile path: a mergeable
    * sketch per column, built for all three columns in ONE pass — no
    * sort, no per-group value buffering. Sketch output is
    * implementation-defined (GK here, t-digest in DuckDB) → rows-only
    * driver check; StatsApproxSpec pins the rank-error contract
    * against the exact quantiles. */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cols = Array("l_quantity", "l_extendedprice", "l_discount")
    val qs = graft.gsod.Stats.approxQuantiles(li, cols,
      Array(0.25, 0.5, 0.75), 0.001)
    import s.implicits._
    Seq((qs(0)(0), qs(0)(1), qs(0)(2),
      qs(1)(0), qs(1)(1), qs(1)(2),
      qs(2)(0), qs(2)(1), qs(2)(2)))
      .toDF("qty_q25", "qty_q50", "qty_q75",
        "price_q25", "price_q50", "price_q75",
        "disc_q25", "disc_q50", "disc_q75")
  }

  /** Exact global median WITHOUT sorting or buffering the row stream —
    * the selection tier between built-in `median` (per-group value
    * buffering) and the GK sketch (approximate): aggregate the column
    * into a value histogram (one partial-aggregable shuffle of
    * ≤ |distinct values| rows), running-sum the tiny histogram, and
    * read both middle order statistics off it. Exact whenever
    * |distinct| ≪ |rows| (ints, fixed-point prices, lengths) — at
    * 100 TB the row stream is never sorted; the only ordered structure
    * is the histogram, and the single-task window is bounded by
    * |distinct|, not |rows|. Even-N interpolation matches DuckDB's
    * `median()` exactly ((x_⌈N/2⌉ + x_⌈(N+1)/2⌉)/2). */
  def qMedianHistogram(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val hist = Tables.documents(s, d).select(col("n_chars"))
      .groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val tot = hist.agg(sum(col("c")).as("n"))
    cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") >= expr("(n + 1) div 2"), col("n_chars"))).as("_lo"),
        min(when(col("cum") >= expr("(n + 2) div 2"), col("n_chars"))).as("_hi"),
        first(col("n")).as("n"))
      .select(((col("_lo") + col("_hi")) / 2.0).as("med"), col("n"))
  }

  val qMedianHistogramSql: String =
    """SELECT median(n_chars) AS med, count(*) AS n FROM documents""".stripMargin

  // ---------------------------------------------------------------- §2.7 O1
  /** Top-k by sort key (TakeOrderedAndProject): top 10 orders by price.
    * At scale this is per-partition top-k + driver merge, never a full
    * sort. */
  def qTopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val qTopKSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- §2.8
  /** Set operations (union-distinct / intersect / except), absent from
    * the reference but part of the engine surface (SURVEY §2.8).
    * Value thresholds keep the user sets partially overlapping so each
    * operator's result is discriminating (every user has every event
    * type, so unfiltered sets would be identical). */
  private def usersOf(s: SparkSession, d: String, et: String, minValue: Double): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === lit(et) && col("value") > lit(minValue))
      .select(col("user_id"))

  def qUnion(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "purchase", 300.0).union(usersOf(s, d, "error", 310.0))
      .distinct().orderBy(col("user_id"))

  val qUnionSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300.0
      |UNION
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 310.0
      |ORDER BY user_id""".stripMargin

  def qIntersect(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "purchase", 300.0).intersect(usersOf(s, d, "error", 310.0))
      .orderBy(col("user_id"))

  val qIntersectSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300.0
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 310.0
      |ORDER BY user_id""".stripMargin

  def qExcept(s: SparkSession, d: String): DataFrame =
    usersOf(s, d, "purchase", 300.0).except(usersOf(s, d, "error", 310.0))
      .orderBy(col("user_id"))

  val qExceptSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300.0
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 310.0
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- §2.11
  /** Tumbling 10-minute event-time aggregation over `events` — batch
    * shape of the Structured Streaming query (same `window()` function
    * drives the streaming variant in graft.streaming). Epoch-aligned
    * buckets match DuckDB's time_bucket.
    *
    * Floats (class-1 integer-exact, re-spelled r14): the raw double
    * `sum(value)` was layout-lucky — bit-stable on the single-row-group
    * harness files but flipped under the strict sweep's reordered
    * multi-file copy at sf0.01 (one ulp on one bucket). events.value is
    * 2-decimal quantized, so the sum is carried as exact integer cents
    * in DECIMAL(38,0)/HUGEINT (order-exact in any partial-agg order,
    * unwrappable at corpus-proportional bucket sizes) with ONE terminal
    * /100 IEEE division per emitted double. */
  def qEventsTimeWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * lit(100)).cast("decimal(38,0)")).as("sv_c"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), (col("sv_c").cast("double") / lit(100.0)).as("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  val qEventsTimeWindowSql: String =
    """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** Windowed distinct users — the EXACT batch/oracle face of
    * [[graft.streaming.Streaming.windowedApproxUsers]] (whose streaming
    * face swaps in the HLL sketch for bounded state; StreamingSpec ties
    * the two within the sketch's error). Exact distinct per (window,
    * type) is a two-phase hash aggregate — fine in batch, unbounded
    * state in streaming, which is exactly the trade the sketch tier
    * documents. */
  def qEventsWindowUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n_users"))
      .orderBy(col("w_start"), col("event_type"))

  val qEventsWindowUsersSql: String =
    """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** Oracle row for the windowed-KLL tier — a PROPERTY gate, not a
    * differential oracle (the q_ntile_approx_bounds /
    * q_sketch_quantile_bounds contract, extended to the per-window
    * sketch face [[graft.streaming.Streaming.windowedQuantiles]]): for
    * EVERY (10-min window, event type) group, the batch run of the
    * same transform must return p50/p90 estimates whose true
    * within-window rank sits within 2·ε(k)+1/n of the requested rank.
    * The output is (n_windows, n_within_p50, n_within_p90); when the
    * contract holds all three equal the exact window count — which
    * DuckDB computes independently from the raw events, so the hash
    * gate fails if even ONE window's estimate drifts out of band.
    *
    * Two shuffles: the windowed sketch agg, then one equi-join of the
    * tiny per-window estimate frame back onto the windowed rows for
    * the exact conditional-rank sums — both partial-aggregable. */
  def qWindowQuantileBounds(s: SparkSession, d: String): DataFrame = {
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(graft.functions.KllSketch.DefaultK, false)
    val est = graft.streaming.Streaming.windowedQuantiles(Tables.events(s, d))
    val ev = Tables.events(s, d).select(
      window(col("ts"), "10 minutes").getField("start").as("w_start"),
      col("event_type"), col("value"))
    val perWindow = ev.join(est, Seq("w_start", "event_type"))
      .groupBy(col("w_start"), col("event_type"))
      .agg(count(lit(1)).as("nw"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
        sum(when(col("value") <= col("p90"), 1L).otherwise(0L)).as("r90"))
    val slack = lit(2 * eps) + lit(1.0) / col("nw")
    perWindow.agg(
      count(lit(1)).as("n_windows"),
      sum(when(abs(col("r50") / col("nw") - 0.5) <= slack, 1L)
        .otherwise(0L)).as("n_within_p50"),
      sum(when(abs(col("r90") / col("nw") - 0.9) <= slack, 1L)
        .otherwise(0L)).as("n_within_p90"))
  }

  val qWindowQuantileBoundsSql: String =
    // property-gate twin: DuckDB recomputes only the EXACT window
    // count; the all-within verdict is the literal expectation
    """WITH w AS (
      |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT count(*) AS n_windows, count(*) AS n_within_p50,
      |  count(*) AS n_within_p90
      |FROM w""".stripMargin

  /** Windowed top-3 leaderboard (10-minute tumbling windows, highest
    * value wins, event_id tie-break) — the batch face of
    * [[graft.streaming.Streaming.windowedTopK]] (StreamingSpec proves
    * the streaming run bit-equal). Oracle = row_number window with the
    * identical ordering. */
  def qEventsWindowTopk(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streaming.windowedTopK(Tables.events(s, d))
      .orderBy(col("w_start"), col("rank"))

  val qEventsWindowTopkSql: String =
    """SELECT w_start, rank, event_id, value FROM (
      |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
      |    event_id, value,
      |    row_number() OVER (
      |      PARTITION BY time_bucket(INTERVAL '10 minutes', ts)
      |      ORDER BY value DESC, event_id) AS rank
      |  FROM events)
      |WHERE rank <= 3
      |ORDER BY w_start, rank""".stripMargin

  /** Gap sessionization through Spark's NATIVE `session_window`
    * operator — the same 30-minute-gap semantics as [[qSessionize]]
    * and the same oracle: merging session windows must produce
    * identical (start, end=max ts, counts, sums), and the per-user
    * ordinal re-derives the window composition's running session_id.
    * Putting the native operator under the hash gate closes the loop
    * the spec-level cross-validation opened: three implementations
    * (window composition, session_window, mapGroupsWithState) now
    * provably agree. Scale note: session_window is a streaming-capable
    * grouping — state merges windows per key — while the batch twin is
    * one sort per user partition; both shuffle once on user_id. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("n_events"), col("session_start"), col("session_end"),
        col("sum_value"))
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start"), col("session_end"), col("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Gap sessionization (30-minute inactivity) over `events`, batch
    * mode — the [[graft.streaming.Streaming.sessionizeBatch]] window
    * composition, oracle-checked against DuckDB's windowed gap-flag
    * running count. The streaming twin (mapGroupsWithState) is spec'd
    * in StreamingSpec. */
  def qSessionize(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streaming.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
      .orderBy(col("user_id"), col("session_id"))

  val qSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |  FROM events
      |), s AS (
      |  SELECT user_id, ts, value,
      |    count(CASE WHEN prev_ts IS NULL
      |               OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 END)
      |      OVER (PARTITION BY user_id ORDER BY ts) AS session_id
      |  FROM g
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  sum(value) AS sum_value
      |FROM s
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Registry fragment for this module. */
  // ------------------------------------------- Typed grouped variance
  /** Per-flag price mean/stddev through the TYPED Dataset path —
    * `groupByKey(...).agg(aggregator.toColumn)` over a case-class
    * encoder with [[graft.functions.WelfordVar]], the one API surface
    * the DataFrame-side custom aggregates (TopKBy, KllSketch) don't
    * exercise. Values match `stddev_samp` (the oracle recomputes with
    * the builtin), but the SPELLING matters at scale: Welford's M2
    * buffer never subtracts near-equal squares, so an offset-heavy
    * column (sensor bias at 1e8) keeps its variance digits where the
    * E[x²]−E[x]² plan loses all of them — WelfordVarSpec plants that
    * case. Merge is the exact partial-aggregation shape: per-partition
    * states combine associatively, ≤ |groups| rows shuffle.
    *
    * Rounding: mean ~3e4 and sd ~2e4 carry ~1e-10 abs reorder error
    * at sf0.1 — round 6 leaves a 5·10³× margin (class-2 policy;
    * variance itself at ~4e8 would NOT survive round 6, which is why
    * the query reports stddev). */
  def qGroupedVariance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("_1"), col("l_extendedprice").as("_2"))
      .as[(String, Double)]
    val agg = new graft.functions.WelfordVar[(String, Double)](_._2)
    ds.groupByKey(_._1).agg(agg.toColumn.name("w"))
      .select(col("key").as("l_returnflag"), col("w.n").as("n"),
        round(col("w.mean"), 6).as("mean_price"),
        // singleton group: stddev_samp is NULL, not the unguarded
        // sqrt(m2/0) NaN — matches the oracle under any group drift
        when(col("w.n") >= 2,
          round(sqrt(col("w.m2") / (col("w.n") - 1)), 6)).as("sd_price"))
      .orderBy(col("l_returnflag"))
  }

  val qGroupedVarianceSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(avg(l_extendedprice), 6) AS mean_price,
      |  round(stddev_samp(l_extendedprice), 6) AS sd_price
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_grouped_variance" -> (qGroupedVariance _),
    "q1_agg" -> (q1Agg _),
    "q_approx_quantile" -> (qApproxQuantile _),
    "q_sessionize" -> (qSessionize _),
    "q_scan_filter" -> (qScanFilter _),
    "q_project_clean" -> (qProjectClean _),
    "q_null_probe" -> (qNullProbe _),
    "q_stats_summary" -> (qStatsSummary _),
    "q_median" -> (qMedian _),
    "q_median_histogram" -> (qMedianHistogram _),
    "q_mode" -> (qMode _),
    "q_topk" -> (qTopK _),
    "q_union" -> (qUnion _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_events_time_window" -> (qEventsTimeWindow _),
    "q_window_quantile_bounds" -> (qWindowQuantileBounds _),
    "q_events_window_topk" -> (qEventsWindowTopk _),
    "q_events_window_users" -> (qEventsWindowUsers _),
    "q_session_window" -> (qSessionWindow _))

  val oracles: Map[String, String] = Map(
    "q_grouped_variance" -> qGroupedVarianceSql,
    "q1_agg" -> q1AggSql,
    "q_sessionize" -> qSessionizeSql,
    // q_session_window shares the sessionize oracle INCLUDING the
    // exact-gap boundary: Spark's session_window merges two sessions
    // when next.start <= prev.end (= prev.ts + gap), so an event
    // landing exactly `gap` after its predecessor stays in the SAME
    // session — identical to this oracle's strictly-greater split.
    // SessionizeBatchSpec pins that boundary agreement on a
    // handcrafted exact-gap fixture, so a future Spark semantics
    // change fails there with a diagnosis, not as a red driver hash.
    "q_session_window" -> qSessionizeSql,
    "q_scan_filter" -> qScanFilterSql,
    "q_project_clean" -> qProjectCleanSql,
    "q_null_probe" -> qNullProbeSql,
    "q_stats_summary" -> qStatsSummarySql,
    "q_median" -> qMedianSql,
    "q_median_histogram" -> qMedianHistogramSql,
    "q_mode" -> qModeSql,
    "q_topk" -> qTopKSql,
    "q_union" -> qUnionSql,
    "q_intersect" -> qIntersectSql,
    "q_except" -> qExceptSql,
    "q_events_time_window" -> qEventsTimeWindowSql,
    "q_window_quantile_bounds" -> qWindowQuantileBoundsSql,
    "q_events_window_topk" -> qEventsWindowTopkSql,
    "q_events_window_users" -> qEventsWindowUsersSql)
}
