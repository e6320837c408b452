package graft

import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, JoinQueries, WindowQueries}

class CoreQueriesSpec extends SparkSpec {

  test("q1_agg produces grouped pricing summary with stable ordering") {
    val rows = CoreQueries.q1Agg(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf001).count())
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys are consistent") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("null probe accounts for every row exactly once") {
    val r = CoreQueries.qNullProbe(spark, sf001).head()
    assert(r.getAs[Long]("n_null_value") + r.getAs[Long]("n_notnull_value")
      == r.getAs[Long]("n_rows"))
    assert(r.getAs[Long]("n_null_value") > 0) // sentinel-nulling actually fired
  }

  test("project_clean: nulls only for error events, fill restores zero") {
    val df = CoreQueries.qProjectClean(spark, sf001)
    assert(df.filter(col("value_clean").isNull && col("event_type") =!= "error").count() == 0)
    assert(df.filter(col("value_clean").isNull && col("value_filled") =!= 0.0).count() == 0)
  }

  test("cube: all four grouping sets present, grand total covers the table") {
    val rows = graft.queries.ExtraQueries.qCube(spark, sf001).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    // grand-total row counts every lineitem exactly once
    val grand = byGid(3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, sf001).count())
    // each marginal's n sums to the table size too
    Seq(0L, 1L, 2L).foreach { g =>
      assert(byGid(g).map(_.getAs[Long]("n")).sum == grand.head.getAs[Long]("n"),
        s"grouping set $g does not partition the table")
    }
  }

  test("set ops: intersect is a subset of union; except disjoint from intersect") {
    val u = CoreQueries.qUnion(spark, sf01).collect().map(_.getLong(0)).toSet
    val i = CoreQueries.qIntersect(spark, sf01).collect().map(_.getLong(0)).toSet
    val e = CoreQueries.qExcept(spark, sf01).collect().map(_.getLong(0)).toSet
    assert(i.subsetOf(u))
    assert((e & i).isEmpty)
    assert((e | i).subsetOf(u))
  }

  test("time window: bucket counts sum to table size, buckets aligned to 10min") {
    val df = CoreQueries.qEventsTimeWindow(spark, sf001)
    assert(df.agg(sum(col("n"))).head().getLong(0) == Tables.events(spark, sf001).count())
    val misaligned = df.filter(
      (unix_timestamp(col("w_start")) % 600) =!= 0).count()
    assert(misaligned == 0)
  }

  test("median query: per-group medians bounded by group min/max") {
    val med = CoreQueries.qMedian(spark, sf001)
    val bounds = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("mo"))
      .agg(min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
    val bad = med.join(bounds, Seq("l_returnflag", "mo"))
      .filter(col("med_qty") < col("lo") || col("med_qty") > col("hi"))
    assert(bad.count() == 0)
  }

  test("mode returns the single most frequent event_type") {
    val m = CoreQueries.qMode(spark, sf001).collect()
    assert(m.length == 1)
    val counts = Tables.events(spark, sf001)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(m(0).getString(0)) == counts.values.max)
  }
}

class JoinQueriesSpec extends SparkSpec {

  test("median fill join preserves probe-side cardinality (left outer)") {
    val n = Tables.lineitem(spark, sf001).count()
    assert(JoinQueries.qJoinMedianFill(spark, sf001).count() == n)
  }

  test("median fill: price_capped equals extendedprice when discount <= 0.05") {
    // (orderkey, linenumber, suppkey) is not unique in the harness data;
    // compare only on keys with a single lineitem row so the re-join
    // pairs each output row with its own source row.
    val keyCols = Seq("l_orderkey", "l_linenumber", "l_suppkey")
    val li = Tables.lineitem(spark, sf001)
      .select((keyCols.map(col) :+ col("l_discount") :+ col("l_extendedprice")): _*)
    val uniq = li.groupBy(keyCols.map(col): _*).count().filter(col("count") === 1)
      .drop("count")
    val out = JoinQueries.qJoinMedianFill(spark, sf001)
    val joined = out.join(li, keyCols).join(uniq, keyCols, "left_semi")
      .filter(col("l_discount") <= 0.05 && col("price_capped") =!= col("l_extendedprice"))
    assert(joined.count() == 0)
  }

  test("revenue by nation covers all 25 nations with positive revenue") {
    val rows = JoinQueries.qJoinRevenueByNation(spark, sf001).collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("semi ∪ anti partitions the left side") {
    val orders = Tables.orders(spark, sf001).count()
    val semi = JoinQueries.qJoinSemi(spark, sf001).count()
    assert(semi > 0 && semi < orders)
    val cust = Tables.customer(spark, sf001).count()
    val anti = JoinQueries.qJoinAnti(spark, sf001).count()
    assert(anti > 0 && anti < cust)
  }
}

class WindowQueriesSpec extends SparkSpec {

  test("lead: exactly one null next_value per user (last row)") {
    val df = WindowQueries.qWindowLead(spark, sf001)
    val nullsPerUser = df.filter(col("next_value").isNull)
      .groupBy(col("user_id")).count().collect()
    assert(nullsPerUser.forall(_.getLong(1) == 1))
    val nUsers = Tables.events(spark, sf001).select(col("user_id")).distinct().count()
    assert(nullsPerUser.length == nUsers)
  }

  test("rows-frame avg: smoothed within per-user min/max") {
    val df = WindowQueries.qWindowRowsAvg(spark, sf001)
    val bounds = Tables.events(spark, sf001)
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bad = df.join(bounds, "user_id")
      .filter(col("smoothed") < col("lo") || col("smoothed") > col("hi"))
    assert(bad.count() == 0)
  }

  test("rank: rn is 1..5 per supplier, running_qty non-decreasing in rn") {
    val rows = WindowQueries.qWindowRank(spark, sf001).collect()
    val bySupp = rows.groupBy(_.getAs[Long]("l_suppkey"))
    bySupp.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to sorted.length))
      val running = sorted.map(_.getAs[Double]("running_qty")).toSeq
      assert(running == running.sorted)
    }
  }

  test("window dist: derived pr/cd bit-exactly match the naive percent_rank/cume_dist window") {
    import org.apache.spark.sql.expressions.Window
    val got = WindowQueries.qWindowDist(spark, sf001).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Double]("pr"), r.getAs[Double]("cd"))).toMap
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val want = Tables.orders(spark, sf001)
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("o_orderkey") % 100 === 0)
      .collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Double]("pr"), r.getAs[Double]("cd"))).toMap
    assert(got.keySet == want.keySet)
    // bit-exact, not approximate: both sides are the same integer-operand
    // IEEE divisions, which is what makes the driver's hash gate safe
    got.foreach { case (k, v) => assert(v == want(k), s"orderkey $k: $v vs ${want(k)}") }
  }
}
