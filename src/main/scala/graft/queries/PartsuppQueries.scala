package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The four inventory-side TPC-H shapes (Q9 profit, Q11 important
  * stock, Q16 supplier relationship, Q20 promotion candidates) — the
  * family a lakehouse user hits for inventory analytics, and the only
  * relational shapes the board lacked (VERDICT r13 "what's missing").
  *
  * The harness ships no partsupp parquet, so all four join against the
  * DERIVED deterministic fixture [[graft.Tables.partsupp]] (4 suppliers
  * per part via a modular stride, dbgen-inspired); [[psCte]] mirrors the
  * derivation bit-for-bit in DuckDB so every row here is hash-gated.
  * Filter adaptations to the harness dictionaries (8 adjectives × 8
  * nouns part names, NATION_k nations, no s_comment) are noted per
  * query.
  *
  * Scale strategy (the JoinQueries doctrine): partsupp is
  * dimension-tier (4·|part|) and broadcasts — derived from the part
  * scan plus a broadcast 1-row supplier count, it never shuffles;
  * lineitem⋈orders remains the only fact⋈fact shuffle in the family.
  */
object PartsuppQueries {

  /** DuckDB twin of [[graft.Tables.partsuppFrom]] — all-integer modular
    * arithmetic on positive operands, so `//`÷`div` and `%` agree
    * across engines and the derived rows are bit-identical. */
  val psCte: String =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         CAST((p_partkey + i.i * (s.s_n // 4)) % s.s_n AS BIGINT)
      |           AS ps_suppkey,
      |         CAST(1 + (p_partkey * 7 + i.i * 13) % 9999 AS INTEGER)
      |           AS ps_availqty,
      |         CAST(100 + (p_partkey * 31 + i.i * 17) % 99901 AS BIGINT)
      |           AS ps_supplycost_c
      |  FROM part
      |  CROSS JOIN (SELECT count(*) AS s_n FROM supplier) s
      |  CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) i
      |)""".stripMargin

  // ------------------------------------------------------ Q9 product profit
  /** Product-type profit (the TPC-H Q9 shape): per (supplier nation,
    * order year), profit = revenue − supply cost over parts whose name
    * matches a token — the first two-fact-side shape on the board to
    * price lineitem rows against partsupp's per-(part, supplier)
    * supply cost. Name filter adapted to the harness dictionary:
    * `p_name LIKE '%gear%'` (1/8 of parts) stands in for dbgen's
    * '%green%'.
    *
    * Scale shape: the name filter runs BEFORE the 4× partsupp explode
    * (the filtered part frame feeds [[graft.Tables.partsuppFrom]]), so
    * the broadcast build side is ⅛·4·|part|; lineitem⋈orders is the
    * only shuffle — supplier (twice: once as the 1-row count, once for
    * nationkey) and nation broadcast; the grouped frame is bounded by
    * 25 nations × |years|.
    *
    * Floats (class-1 integer-exact): amount_i = ec·(100−dc) −
    * 100·sc_c·qty is an exact long per row (|amount_i| ≲ 10¹³),
    * accumulated in DECIMAL(38,0)/HUGEINT (a 100 TB nation-year group
    * cannot wrap 128 bits), ONE terminal /10⁴ per group. */
  def qProfitByNation(s: SparkSession, d: String): DataFrame = {
    val pGear = Tables.part(s, d).filter(col("p_name").like("%gear%"))
    val ps = Tables.partsuppFrom(pGear, Tables.supplier(s, d))
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      (round(col("l_extendedprice") * lit(100)).cast("long") *
        (lit(100L) - round(col("l_discount") * lit(100)).cast("long")))
        .as("rev_i"),
      round(col("l_quantity")).cast("long").as("qty"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    li.join(broadcast(ps),
        li("l_partkey") === ps("ps_partkey") &&
          li("l_suppkey") === ps("ps_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .select(col("nation"), col("o_year"),
        (col("rev_i") - lit(100L) * col("ps_supplycost_c") * col("qty"))
          .cast("decimal(38,0)").as("amount_i"))
      .groupBy(col("nation"), col("o_year"))
      .agg((sum(col("amount_i")).cast("double") / lit(10000.0))
          .as("sum_profit"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val qProfitByNationSql: String =
    s"""WITH $psCte,
       |amounts AS (
       |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |    CAST(round(l_extendedprice * 100) AS BIGINT)
       |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
       |      - 100 * ps_supplycost_c * CAST(round(l_quantity) AS BIGINT)
       |      AS amount_i
       |  FROM lineitem
       |  JOIN orders   ON o_orderkey = l_orderkey
       |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
       |  JOIN part     ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation   ON n_nationkey = s_nationkey
       |  WHERE p_name LIKE '%gear%'
       |)
       |SELECT nation, o_year,
       |  CAST(sum(amount_i) AS DOUBLE) / 10000.0 AS sum_profit,
       |  count(*) AS n_items
       |FROM amounts GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  // ----------------------------------------------------- Q11 important stock
  /** Important stock (the TPC-H Q11 shape): parts whose inventory
    * value held by one nation's suppliers stands above the herd.
    * Threshold adapted to be SCALE-FREE: dbgen's `> 0.0001 · total`
    * only works because |part| grows with SF; here a part qualifies
    * when its value exceeds 2× the MEAN per-part value
    * (`value·n_parts > 2·total` in exact integers), which selects a
    * stable "head" at every SF (14/36/412 rows at the three harness
    * SFs) and at 100 TB.
    *
    * Scale shape: partsupp (dimension-tier) joins the broadcast
    * nation-filtered supplier key list — no fact table anywhere; the
    * per-part groupBy is the only shuffle. The grouped frame feeds
    * both the 1-row total (broadcast back) and the filter — it plans
    * twice, but both plans touch only part/supplier dims (the
    * one-fact-scan discipline concerns fact scans; a dim-bounded
    * double derivation is cheaper than materializing).
    *
    * Floats (class-1 integer-exact): per-row v_c = sc_c·availqty ≤
    * 10⁹ exact; per-part value_c (≤ 4 rows by PK) and the grand total
    * are DECIMAL(38,0)/HUGEINT; the threshold compares exact integers
    * (`value_c·n_parts > 2·total_c`), and the emitted value is one
    * terminal /100 division. Ties in the DESC value order are broken
    * by ps_partkey. */
  def qImportantStock(s: SparkSession, d: String): DataFrame = {
    val supN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val grouped = Tables.partsupp(s, d)
      .join(broadcast(supN), col("ps_suppkey") === col("s_suppkey"))
      .groupBy(col("ps_partkey"))
      .agg(sum((col("ps_supplycost_c") * col("ps_availqty"))
        .cast("decimal(38,0)")).as("value_c"))
    val total = grouped
      .agg(sum(col("value_c")).as("total_c"), count(lit(1)).as("n_parts"))
    grouped.crossJoin(broadcast(total))
      .filter(col("value_c") * col("n_parts") > lit(2) * col("total_c"))
      .select(col("ps_partkey"),
        (col("value_c").cast("double") / lit(100.0)).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val qImportantStockSql: String =
    s"""WITH $psCte,
       |filtered AS (
       |  SELECT ps_partkey, ps_supplycost_c * ps_availqty AS v_c
       |  FROM partsupp
       |  JOIN supplier ON s_suppkey = ps_suppkey
       |  JOIN nation   ON n_nationkey = s_nationkey
       |  WHERE n_name = 'NATION_3'
       |), grouped AS (
       |  SELECT ps_partkey, sum(v_c) AS value_c FROM filtered
       |  GROUP BY ps_partkey
       |), total AS (
       |  SELECT sum(value_c) AS total_c, count(*) AS n_parts FROM grouped
       |)
       |SELECT ps_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
       |FROM grouped, total
       |WHERE value_c * n_parts > 2 * total_c
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // --------------------------------------------- Q16 supplier relationship
  /** Supplier-relationship count (the TPC-H Q16 shape): how many
    * distinct suppliers can source each surviving (brand, type, size)
    * bucket, excluding blacklisted suppliers. Harness adaptations:
    * the NOT-LIKE type filter keys on the 6-value type dictionary
    * (`NOT LIKE 'MEDIUM%'`), and — with no s_comment column — the
    * "customer complaints" blacklist becomes suppliers with NEGATIVE
    * account balance (6 of 100 at sf0.01), applied as a broadcast
    * anti-join (the NOT IN shape, null-safe by construction since
    * s_suppkey is a key).
    *
    * Scale shape: no fact table — part filters (brand ≠, type NOT
    * LIKE, size IN 8) BEFORE the 4× explode; the blacklist broadcasts
    * as an anti-join; countDistinct shuffles on the (brand, type,
    * size) key into a ≤ 25·6·50-bounded frame. The distinct expansion
    * is per-(group, suppkey) — partial-aggregable in Spark's two-phase
    * distinct plan. All-integer output: no float policy needed. */
  def qSupplierRelationship(s: SparkSession, d: String): DataFrame = {
    val p16 = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#21" &&
        !col("p_type").like("MEDIUM%") &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val ps = Tables.partsuppFrom(p16, Tables.supplier(s, d))
    val complaints = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    ps.join(broadcast(p16), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val qSupplierRelationshipSql: String =
    s"""WITH $psCte
       |SELECT p_brand, p_type, p_size,
       |  count(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp
       |JOIN part ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#21' AND p_type NOT LIKE 'MEDIUM%'
       |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
       |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
       |                         WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------- Q20 promotion candidates
  /** Promotion candidates (the TPC-H Q20 shape): suppliers holding
    * surplus stock of promotable parts — availqty exceeds half of
    * what they actually shipped of that part in the focal year. The
    * nested-semi-join chain (parts by name prefix → partsupp rows
    * with the correlated shipped-quantity threshold → suppliers) is
    * the textbook Q20 plan; the harness's l_suppkey is uncorrelated
    * with the derived partsupp stride, so the final supplier list is
    * naturally sparse (9/38/40 rows across SFs) and dbgen's trailing
    * nation FILTER would starve it — the nation join is kept for the
    * readout (n_name column) but not filtered (documented deviation).
    *
    * Scale shape: ONE lineitem scan with the ship-year predicate
    * pushed to parquet, partial-aggregated to per-(part, supplier)
    * quantity; the name-filtered partsupp (⅛·4·|part|) broadcasts
    * onto it; the candidate key list is ≤ |supplier| and broadcasts
    * into a left-semi against the supplier dim.
    *
    * Floats: none — the threshold `2·availqty > Σqty` compares exact
    * integers (quantities are integral, summed as longs; a
    * (part, supplier, year) group at 100 TB stays far under 2⁶³). */
  def qPromoCandidates(s: SparkSession, d: String): DataFrame = {
    val pBlue = Tables.part(s, d).filter(col("p_name").like("blue%"))
    val ps = Tables.partsuppFrom(pBlue, Tables.supplier(s, d))
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
    val cand = shipped.join(broadcast(ps),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .filter(lit(2) * col("ps_availqty") > col("qty"))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(cand), col("s_suppkey") === col("ps_suppkey"),
        "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val qPromoCandidatesSql: String =
    s"""WITH $psCte,
       |shipped AS (
       |  SELECT l_partkey, l_suppkey,
       |         sum(CAST(round(l_quantity) AS BIGINT)) AS qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate <  TIMESTAMP '1997-01-01'
       |  GROUP BY l_partkey, l_suppkey
       |), candidates AS (
       |  SELECT DISTINCT ps_suppkey
       |  FROM partsupp
       |  JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'blue%'
       |  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |  WHERE 2 * ps_availqty > qty
       |)
       |SELECT s_suppkey, s_name, n_name
       |FROM supplier
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE s_suppkey IN (SELECT ps_suppkey FROM candidates)
       |ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profit_by_nation" -> (qProfitByNation _),
    "q_important_stock" -> (qImportantStock _),
    "q_supplier_relationship" -> (qSupplierRelationship _),
    "q_promo_candidates" -> (qPromoCandidates _))

  val oracles: Map[String, String] = Map(
    "q_profit_by_nation" -> qProfitByNationSql,
    "q_important_stock" -> qImportantStockSql,
    "q_supplier_relationship" -> qSupplierRelationshipSql,
    "q_promo_candidates" -> qPromoCandidatesSql)
}
