package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Budget, Expectations}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expectations" -> (qExpectations _),
    "q_token_budget" -> (qTokenBudget _))

  val oracles: Map[String, String] = Map(
    "q_expectations" -> qExpectationsSql,
    "q_token_budget" -> qTokenBudgetSql)
}
