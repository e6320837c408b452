package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.ExtraQueries

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: picks latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 12:00:00"))  // key with one right row
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), "r1", 1L),
      (10L, ts("2024-01-01 11:00:00"), "r2", 2L),
      (10L, ts("2024-01-01 13:00:00"), "r3", 3L),
      (20L, ts("2024-01-01 12:00:00"), "r4", 4L), // exact tie: at-or-before
      (20L, ts("2024-01-01 12:00:00"), "r5", 5L)  // co-timestamped: highest rk wins
    ).toDF("k", "rt", "tag", "rk")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Map("tag" -> "tag"),
      tieBreak = "rk")
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("tag"))).toSeq ==
      Seq(Some("r1"), Some("r2"), None, Some("r5")))
  }

  test("as-of query matches row count of left side (left join semantics)") {
    val out = ExtraQueries.qAsofJoin(spark, sf001)
    assert(out.count() == graft.Tables.events(spark, sf001).count())
  }

  test("as-of plan: one shuffle on the key, no nested-loop join") {
    val p = ExtraQueries.qAsofJoin(spark, sf001).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated:\n$p")
    assert(p.contains("Window"), s"expected window-based composition:\n$p")
  }
}

class ExtraQueriesSpec extends SparkSpec {

  test("stratified sample: only requested strata, fraction in sane band") {
    val out = ExtraQueries.qSampleStratified(spark, sf01).collect()
    val byFlag = out.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(byFlag.keySet.subsetOf(Set("A", "N", "R")))
    val totals = graft.Tables.lineitem(spark, sf01)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Bernoulli sampling: expect fraction within a loose band
    val fA = byFlag.getOrElse("A", 0).toDouble / totals("A")
    assert(fA > 0.05 && fA < 0.15, s"A fraction $fA")
  }

  test("approx distinct within declared error of exact") {
    val approx = ExtraQueries.qApproxDistinct(spark, sf01).head()
    val exact = graft.Tables.lineitem(spark, sf01).agg(
      countDistinct(col("l_partkey")), countDistinct(col("l_orderkey")),
      countDistinct(col("l_quantity"))).head()
    for (i <- 0 until 3) {
      val (a, e) = (approx.getLong(i).toDouble, exact.getLong(i).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"col $i: approx $a vs exact $e")
    }
  }
}
