package graft

import graft.queries.CoreQueries

class CoreQueriesSpec extends SparkSpec {

  test("q1_agg produces grouped pricing summary with stable ordering") {
    val rows = CoreQueries.q1Agg(spark, sf001).collect()
    assert(rows.nonEmpty)
    // total count_order across groups == table row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf001).count())
    // ordering is total on (l_returnflag, l_linestatus)
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys are consistent") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
