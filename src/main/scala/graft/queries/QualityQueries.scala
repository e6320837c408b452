package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Budget, Expectations, Profile, SnapshotDiff}
import graft.ops.Expectations._

/** Data-quality gate queries — the validation pass a training
  * pipeline runs on every table generation before it may feed a job.
  * See [[graft.ops.Expectations]] for the single-pass compilation. */
object QualityQueries {

  /** Expectation report over lineitem + orders: one conditional-agg
    * pass per table plus the one genuinely-join-shaped check
    * (referential integrity), unioned into a (tbl, check,
    * violation_fraction, tolerance, passed) report. The check list
    * deliberately includes a FAILING row (unique(l_orderkey) — the
    * key repeats per line item) and a tolerated-violation row
    * (in_range(l_discount) with a 60% budget), so the report's
    * fraction arithmetic is exercised, not just its zero path. */
  def qExpectations(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val liReport = Expectations.report(li, Seq(
      Size(1),
      Complete("l_orderkey"),
      Unique("l_orderkey"),
      InRange("l_quantity", 1.0, 50.0),
      InRange("l_discount", 0.0, 0.05, tolerance = 0.6),
      InSet("l_returnflag", Seq("A", "N", "R")),
      Satisfies("positive_price", col("l_extendedprice") > 0.0)))
      .select(lit("lineitem").as("tbl"), col("*"))
    val oReport = Expectations.report(o, Seq(
      Size(1),
      Unique("o_orderkey"),
      Complete("o_custkey"),
      InSet("o_orderstatus", Seq("O", "F", "P")),
      InRange("o_totalprice", 0.0, 1e9)))
      .select(lit("orders").as("tbl"), col("*"))
    val ref = Expectations.orphanFraction(li, "l_orderkey", o, "o_orderkey")
      .select(lit("lineitem").as("tbl"), col("*"))
    liReport.unionByName(oReport).unionByName(ref)
      .orderBy(col("tbl"), col("check"))
  }

  val qExpectationsSql: String =
    """WITH li AS (
      |  SELECT
      |    round(CAST(CASE WHEN count(*) < 1 THEN 1.0 ELSE 0.0 END AS DOUBLE), 9) AS m_size,
      |    round(avg(CASE WHEN l_orderkey IS NULL THEN 1.0 ELSE 0.0 END), 9) AS m_complete,
      |    round(1.0 - CAST(count(DISTINCT l_orderkey) AS DOUBLE)
      |      / count(CASE WHEN l_orderkey IS NOT NULL THEN 1 END), 9) AS m_unique,
      |    round(avg(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1.0 ELSE 0.0 END), 9) AS m_qty,
      |    round(avg(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1.0 ELSE 0.0 END), 9) AS m_disc,
      |    round(avg(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R') THEN 1.0 ELSE 0.0 END), 9) AS m_flag,
      |    round(avg(CASE WHEN NOT (l_extendedprice > 0.0) THEN 1.0 ELSE 0.0 END), 9) AS m_price
      |  FROM lineitem
      |), o AS (
      |  SELECT
      |    round(CAST(CASE WHEN count(*) < 1 THEN 1.0 ELSE 0.0 END AS DOUBLE), 9) AS m_size,
      |    round(1.0 - CAST(count(DISTINCT o_orderkey) AS DOUBLE)
      |      / count(CASE WHEN o_orderkey IS NOT NULL THEN 1 END), 9) AS m_unique,
      |    round(avg(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 9) AS m_complete,
      |    round(avg(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P') THEN 1.0 ELSE 0.0 END), 9) AS m_status,
      |    round(avg(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0.0 OR o_totalprice > 1e9) THEN 1.0 ELSE 0.0 END), 9) AS m_total
      |  FROM orders
      |), ref AS (
      |  SELECT round(avg(CASE WHEN h.k IS NULL THEN 1.0 ELSE 0.0 END), 9) AS m
      |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) h
      |    ON l.l_orderkey = h.k
      |)
      |SELECT * FROM (
      |  SELECT 'lineitem' AS tbl, 'complete(l_orderkey)' AS "check", m_complete AS violation_fraction, 0.0 AS tolerance, m_complete <= 0.0 AS passed FROM li
      |  UNION ALL SELECT 'lineitem', 'unique(l_orderkey)', m_unique, 0.0, m_unique <= 0.0 FROM li
      |  UNION ALL SELECT 'lineitem', 'in_range(l_quantity)', m_qty, 0.0, m_qty <= 0.0 FROM li
      |  UNION ALL SELECT 'lineitem', 'in_range(l_discount)', m_disc, 0.6, m_disc <= 0.6 FROM li
      |  UNION ALL SELECT 'lineitem', 'in_set(l_returnflag)', m_flag, 0.0, m_flag <= 0.0 FROM li
      |  UNION ALL SELECT 'lineitem', 'positive_price', m_price, 0.0, m_price <= 0.0 FROM li
      |  UNION ALL SELECT 'lineitem', 'size(>=1)', m_size, 0.0, m_size <= 0.0 FROM li
      |  UNION ALL SELECT 'orders', 'size(>=1)', m_size, 0.0, m_size <= 0.0 FROM o
      |  UNION ALL SELECT 'orders', 'unique(o_orderkey)', m_unique, 0.0, m_unique <= 0.0 FROM o
      |  UNION ALL SELECT 'orders', 'complete(o_custkey)', m_complete, 0.0, m_complete <= 0.0 FROM o
      |  UNION ALL SELECT 'orders', 'in_set(o_orderstatus)', m_status, 0.0, m_status <= 0.0 FROM o
      |  UNION ALL SELECT 'orders', 'in_range(o_totalprice)', m_total, 0.0, m_total <= 0.0 FROM o
      |  UNION ALL SELECT 'lineitem', 'references(l_orderkey)', m, 0.0, m <= 0.0 FROM ref
      |)
      |ORDER BY tbl, "check"""".stripMargin

  /** Token-budget corpus selection: keep the highest-quality documents
    * whose cumulative whitespace-token count fits 1/4 of the corpus's
    * total tokens — the data-mix step that turns a scored crawl into a
    * pretraining corpus. Runs [[graft.ops.Budget.selectByBudget]]'s
    * two-level distributed prefix sum; the oracle is the naive global
    * window cumsum, so the hash gate proves the scale-safe plan
    * computes exactly the single-task semantics. */
  def qTokenBudget(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.TextAnalysis
      .withQualitySignals(Tables.documents(s, d))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    Budget.selectByBudget(scored, "quality_score", "n_tokens", "doc_id",
        num = 1L, den = 4L)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        col("cum_weight").as("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  val qTokenBudgetSql: String = {
    val qualityCte = TextQueries.qTextQualitySql
      .replace("\nORDER BY doc_id", "").replace("ORDER BY doc_id", "")
    // CAST both the window sum and the total: DuckDB sum(INTEGER) is
    // HUGEINT vs Spark's BIGINT (COVERAGE.md typing rule).
    s"""WITH q AS (
       |$qualityCte
       |), w AS (
       |  SELECT doc_id, n_tokens, quality_score,
       |    CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM q
       |), t AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM q
       |)
       |SELECT doc_id, n_tokens, quality_score, cum_tokens
       |FROM w, t
       |WHERE cum_tokens * 4 <= total
       |ORDER BY doc_id""".stripMargin
  }

  /** Snapshot audit diff between two generations of the orders table
    * (both derived deterministically from the harness table: the old
    * snapshot drops keys ≡3 mod 11, the new drops keys ≡5 mod 13 and
    * rewrites price/status for keys ≡0 mod 17 / ≡0 mod 23), classified
    * per key as added / removed / changed by
    * [[graft.ops.SnapshotDiff.diff]]. Output keeps only the non-
    * unchanged keys — the audit's actionable rows. One full-outer
    * sort-merge join on the primary key; change detection is null-safe
    * column compare, never a stringified fingerprint. */
  def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val oldSnap = orders.filter(col("o_orderkey") % 11 =!= 3)
    val newSnap = orders.filter(col("o_orderkey") % 13 =!= 5)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 17 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 23 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    SnapshotDiff.diff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
      .filter(col("diff_class") =!= "unchanged")
      .select(col("o_orderkey"), col("diff_class"),
        col("old_o_orderstatus").as("old_status"),
        col("new_o_orderstatus").as("new_status"),
        col("old_o_totalprice").as("old_price"),
        col("new_o_totalprice").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  val qSnapshotDiffSql: String =
    """WITH old_snap AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 11 <> 3
      |), new_snap AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 23 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 13 <> 5
      |), j AS (
      |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |    a.o_orderstatus AS old_status, b.o_orderstatus AS new_status,
      |    a.o_totalprice AS old_price, b.o_totalprice AS new_price,
      |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
      |         WHEN b.o_orderkey IS NULL THEN 'removed'
      |         WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
      |           OR a.o_totalprice IS DISTINCT FROM b.o_totalprice THEN 'changed'
      |         ELSE 'unchanged' END AS diff_class
      |  FROM old_snap a FULL OUTER JOIN new_snap b ON a.o_orderkey = b.o_orderkey
      |)
      |SELECT o_orderkey, diff_class, old_status, new_status, old_price, new_price
      |FROM j WHERE diff_class <> 'unchanged'
      |ORDER BY o_orderkey""".stripMargin

  private val profileCols: Seq[(String, Boolean)] = Seq(
    "l_orderkey" -> true, "l_linenumber" -> true, "l_quantity" -> true,
    "l_extendedprice" -> true, "l_discount" -> true, "l_tax" -> true,
    "l_returnflag" -> false, "l_linestatus" -> false)

  /** One-pass column profile of lineitem (null count / exact distinct
    * / numeric min-max per column, long form) —
    * [[graft.ops.Profile.profile]]: the single-job replacement for the
    * reference's per-column `filter(isNull).count()` loop (32 jobs,
    * SURVEY §4.3.1). */
  def qTableProfile(s: SparkSession, d: String): DataFrame =
    Profile.profile(Tables.lineitem(s, d), profileCols)
      .orderBy(col("col_name"))

  val qTableProfileSql: String = {
    val rows = profileCols.map { case (c, num) =>
      val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name,
         |  count(CASE WHEN $c IS NULL THEN 1 END) AS null_count,
         |  count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_val, $mx AS max_val
         |FROM lineitem""".stripMargin
    }
    rows.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ------------------------------------------ Learned quality classifier
  /** Corpus-wide scores from the fastText-style hashed-ngram logistic
    * classifier ([[graft.text.QualityModel]]) — the learned tier
    * between q_quality_gopher's hard rules and dedup. Rows-only by
    * design: the scores are LR-coefficient-dependent floats (L-BFGS is
    * data-deterministic only up to partial-agg float order), so the
    * driver-verified guarantees live in the banded literal twin
    * [[qQualityClassifierBounds]] — the gate-from-day-one convention.
    *
    * Scale shape: scoring is [[graft.text.QualityModel.scoreWith]]'s
    * broadcast-weight join + per-doc partial-aggregable sum (no
    * vectors, no UDFs); the fit is a per-scale-dir cached build. */
  def qQualityClassifier(s: SparkSession, d: String): DataFrame =
    graft.text.QualityModel.score(s, d)

  /** Hash-green gate for [[qQualityClassifier]] (fail-closed: every
    * verdict is false on an empty/degenerate corpus): the fit saw both
    * splits, the weight table is full-width, holdout ROC-AUC clears a
    * fat-margin floor vs the qRaterAgreement heuristic labels
    * (measured ≳ 0.9 across SFs; floor 0.75 absorbs LR float-order
    * jitter), the corpus scored completely through the broadcast-weight
    * path, and the keep verdict is non-degenerate. */
  def qQualityClassifierBounds(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val f = graft.text.QualityModel.fit(s, d)
    val scored = graft.text.QualityModel.score(s, d)
    val a = scored.agg(count(lit(1)).as("n"),
      count(when(col("score").isNull, 1)).as("n_null"),
      count(when(col("keep"), 1)).as("n_keep")).head()
    val (n, nNull, nKeep) = (a.getLong(0), a.getLong(1), a.getLong(2))
    val nDocs = Tables.documents(s, d).count()
    val ok = f.nTrain > 0 && f.nHold > 0
    Seq(
      ("corpus_scored_complete", ok && n == nDocs && nNull == 0L && n > 0L),
      ("fit_nonempty", ok),
      ("holdout_auc_beats_floor", ok && f.auc >= 0.75),
      ("holdout_auc_valid", ok && f.auc >= 0.0 && f.auc <= 1.0),
      ("keep_rate_nontrivial", ok && nKeep > 0L && nKeep < n),
      ("weights_full_width",
        ok && f.weights.length == graft.text.QualityModel.Dim))
      .toDF("check", "within_bounds")
      .orderBy(col("check"))
  }

  val qQualityClassifierBoundsSql: String =
    """SELECT * FROM (VALUES ('corpus_scored_complete', true),
      |  ('fit_nonempty', true), ('holdout_auc_beats_floor', true),
      |  ('holdout_auc_valid', true), ('keep_rate_nontrivial', true),
      |  ('weights_full_width', true)) t("check", within_bounds)
      |ORDER BY "check"""".stripMargin

  /** The events-stream expectations report — the BATCH twin of the
    * live validation gate ([[graft.streaming.Streaming]]'s
    * expectationCounts/expectationsFinalize faces; this query runs the
    * identical counts + finalize composition over the static table, so
    * the replay spec's bit-for-bit claim has a driver-visible
    * hash-green anchor). Count-mergeable checks only (Complete /
    * InRange / InSet — Unique needs a distinct and stays in
    * q_expectations' batch algebra); the known-type check appears at
    * two budgets so both verdict paths are exercised. ONE
    * conditional-aggregation pass, one state row, fractions =
    * round(Σ indicator / n, 9) — the q_expectations float precedent. */
  def qExpectationsEvents(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streaming.expectationsFinalize(
      graft.streaming.Streaming.expectationCounts(Tables.events(s, d)))

  val qExpectationsEventsSql: String =
    """WITH c AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v_complete_user,
      |    sum(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 400.0)
      |        THEN 1 ELSE 0 END) AS v_value_range,
      |    sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
      |        ('view','click','purchase','signup') THEN 1 ELSE 0 END)
      |      AS v_known_type,
      |    sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS v_ts_present
      |  FROM events
      |), r AS (
      |  SELECT 'complete(user_id)' AS "check",
      |    round(CAST(v_complete_user AS DOUBLE) / n, 9) AS violation_fraction,
      |    0.0 AS tolerance FROM c
      |  UNION ALL SELECT 'in_range(value,0,400)',
      |    round(CAST(v_value_range AS DOUBLE) / n, 9), 0.01 FROM c
      |  UNION ALL SELECT 'known_type_budget25',
      |    round(CAST(v_known_type AS DOUBLE) / n, 9), 0.25 FROM c
      |  UNION ALL SELECT 'known_type_budget10',
      |    round(CAST(v_known_type AS DOUBLE) / n, 9), 0.10 FROM c
      |  UNION ALL SELECT 'complete(ts)',
      |    round(CAST(v_ts_present AS DOUBLE) / n, 9), 0.0 FROM c
      |)
      |SELECT "check", violation_fraction, tolerance,
      |  violation_fraction <= tolerance AS passed
      |FROM r ORDER BY "check"""".stripMargin

  // ------------------------------------------------ Blocklist screen
  /** The FROZEN banned-phrase list for the blocklist gate — a policy
    * artifact pinned under version control like the BPE merge table,
    * never derived from data at query time (a blocklist that shifts
    * with the corpus is a reproducibility bug). Mixed on purpose:
    * high-frequency phrases ("sort merge", "hash join"), rare ones
    * ("fast merge batch", "key agg row"), a SELF-BORDERED one
    * ("table table" — its occurrences can chain-overlap, exercising
    * the leftmost non-overlapping count in both tiers), and a
    * zero-hit canary ("drop table") proving absent phrases cost
    * nothing and flag nothing. */
  val BlockPhrases: Seq[String] = Seq(
    "slow scan", "fast merge batch", "table table", "key agg row",
    "hash join", "drop table", "window window", "sort merge")

  /** Banned-phrase screening, codegen tier
    * ([[graft.text.Blocklist.screen]]): per-document hit list,
    * leftmost non-overlapping occurrence count, and keep verdict
    * under [[BlockPhrases]]. One narrow whole-stage-codegen pass —
    * the phrase list is a literal array and all the match arithmetic
    * is higher-order-function algebra; no shuffle, no UDF. At 100 TB
    * the cost is the corpus read itself. */
  def qBlocklistFilter(s: SparkSession, d: String): DataFrame =
    graft.text.Blocklist.screen(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", BlockPhrases)
      .orderBy(col("doc_id"))

  /** Banned-phrase screening, Aho–Corasick tier
    * ([[graft.text.Blocklist.screenAc]]): the SAME output contract as
    * [[qBlocklistFilter]] computed by a broadcast goto/fail automaton
    * in ONE pass per document — O(|text| + matches) regardless of the
    * pattern count, the tier for thousands-of-patterns blocklists
    * where per-phrase substring scans would multiply the corpus read.
    * Sharing the codegen tier's SQL oracle makes the tier equivalence
    * a driver-visible HASH row (the q_contamination_hashed
    * discipline), on top of BlocklistSpec's planted fixtures. */
  def qBlocklistAc(s: SparkSession, d: String): DataFrame =
    graft.text.Blocklist.screenAc(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", BlockPhrases)
      .orderBy(col("doc_id"))

  val qBlocklistFilterSql: String =
    graft.text.Blocklist.oracleSelectSql("doc_id", "text", BlockPhrases) +
      "\nFROM documents\nORDER BY doc_id"

  /** Blocklist excision ([[graft.text.Blocklist.excise]]): the
    * rewrite downstream of the screen — every leftmost
    * non-overlapping occurrence of every frozen phrase replaced by
    * the marker, phrases chained in sorted order (the order IS the
    * contract; the oracle replays the identical chain). The
    * detect→transform split mirrors q_span_dedup → q_span_excise. */
  def qBlocklistExcise(s: SparkSession, d: String): DataFrame =
    graft.text.Blocklist.excise(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", BlockPhrases)
      .orderBy(col("doc_id"))

  val qBlocklistExciseSql: String =
    graft.text.Blocklist.exciseSelectSql("doc_id", "text", BlockPhrases) +
      "\nFROM documents\nORDER BY doc_id"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expectations" -> (qExpectations _),
    "q_expectations_events" -> (qExpectationsEvents _),
    "q_token_budget" -> (qTokenBudget _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_table_profile" -> (qTableProfile _),
    "q_quality_classifier" -> (qQualityClassifier _),
    "q_quality_classifier_bounds" -> (qQualityClassifierBounds _),
    "q_blocklist_filter" -> (qBlocklistFilter _),
    "q_blocklist_ac" -> (qBlocklistAc _),
    "q_blocklist_excise" -> (qBlocklistExcise _))

  val oracles: Map[String, String] = Map(
    "q_expectations" -> qExpectationsSql,
    "q_expectations_events" -> qExpectationsEventsSql,
    "q_token_budget" -> qTokenBudgetSql,
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_table_profile" -> qTableProfileSql,
    "q_quality_classifier_bounds" -> qQualityClassifierBoundsSql,
    "q_blocklist_filter" -> qBlocklistFilterSql,
    // the AC tier's output contract is identical by construction —
    // sharing the codegen tier's oracle turns tier equivalence into a
    // hash-green driver row (see qBlocklistAc's scaladoc)
    "q_blocklist_ac" -> qBlocklistFilterSql,
    "q_blocklist_excise" -> qBlocklistExciseSql)
}
