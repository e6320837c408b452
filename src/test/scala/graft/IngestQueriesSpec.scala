package graft

import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, IngestQueries}

class IngestQueriesSpec extends SparkSpec {

  test("csv roundtrip equals the parquet original, values and schema") {
    val csv = IngestQueries.qCsvRoundtrip(spark, sf001).collect()
    val pq = Tables.supplier(spark, sf001)
      .orderBy(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .collect()
    assert(csv.length == pq.length && csv.length > 0)
    csv.zip(pq).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("jsonl roundtrip equals the parquet original; hostile strings survive") {
    val js = IngestQueries.qJsonlRoundtrip(spark, sf001).collect()
    val pq = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .orderBy(col("doc_id")).collect()
    assert(js.length == pq.length && js.length > 0)
    js.zip(pq).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // escaping torture: quotes, backslashes, newlines, tabs, unicode,
    // and a JSON-looking payload must survive the write/read intact
    import spark.implicits._
    val hostile = Seq(
      (1L, "quote \" backslash \\ done"),
      (2L, "line\nbreak and\ttab"),
      (3L, "déjà vu 你好 😀"),
      (4L, """{"not":"a struct","n":[1,2]}"""))
      .toDF("doc_id", "text")
    val dir = graft.TempDirs.create("graft_jsonl_spec_").toString
    hostile.write.mode("overwrite").json(dir)
    val back = spark.read.schema(hostile.schema).json(dir)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = hostile.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want)
  }

  test("orc roundtrip equals the parquet original, values and schema") {
    val orc = IngestQueries.qOrcRoundtrip(spark, sf001)
    val pq = Tables.orders(spark, sf001).orderBy(col("o_orderkey"))
    assert(orc.schema == pq.schema)
    val a = orc.collect(); val b = pq.collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("partitioned scan: the filter prunes at the partition level") {
    val df = IngestQueries.qPartitionedScan(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    // values equal the unpartitioned aggregate
    val expected = Tables.lineitem(spark, sf001)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_linestatus")).collect().toSeq
    assert(df.collect().toSeq == expected)
  }

  test("bucketed join: no hash exchange anywhere in the plan") {
    val df = graft.queries.JoinQueries.qBucketedJoin(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join/agg should not hash-shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("approx quantiles honor the GK rank-error bound vs exact ranks") {
    val li = Tables.lineitem(spark, sf001).select(col("l_quantity"), col("l_extendedprice")).persist()
    val n = li.count()
    val row = CoreQueries.qApproxQuantile(spark, sf001).head()
    val checks = Seq(
      ("l_quantity", 0.25, row.getDouble(0)),
      ("l_quantity", 0.50, row.getDouble(1)),
      ("l_quantity", 0.75, row.getDouble(2)),
      ("l_extendedprice", 0.50, row.getDouble(4)))
    val relErr = 0.001
    checks.foreach { case (c, p, v) =>
      val le = li.filter(col(c) <= v).count()
      val lt = li.filter(col(c) < v).count()
      // GK guarantee: some value whose rank r satisfies
      // |r − p·n| <= relErr·n is returned; the value's rank interval is
      // [lt+1, le]
      val lo = p * n - relErr * n - 1
      val hi = p * n + relErr * n + 1
      assert(le >= lo && lt + 1 <= hi,
        s"$c p=$p value=$v rank interval [${lt + 1}, $le] misses [$lo, $hi]")
    }
    li.unpersist()
    // quantiles are non-decreasing within a column
    assert(row.getDouble(0) <= row.getDouble(1) && row.getDouble(1) <= row.getDouble(2))
    assert(row.getDouble(3) <= row.getDouble(4) && row.getDouble(4) <= row.getDouble(5))
    assert(row.getDouble(6) <= row.getDouble(7) && row.getDouble(7) <= row.getDouble(8))
  }
}
