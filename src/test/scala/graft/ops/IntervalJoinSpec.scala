package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.JoinQueries

class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  // probe: (id, t); intervals: (iv, lo, hi) — micros-scale longs not
  // required, the op is unit-agnostic.
  private val probe = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 150L), (5L, 199L),
    (6L, 200L), (7L, 1000L)
  ).toDF("id", "t")

  test("half-open semantics: t == start matches, t == end does not") {
    val iv = Seq((10L, 100L, 200L)).toDF("iv", "lo", "hi")
    val got = IntervalJoin.overlap(probe, "t", iv, "lo", "hi", Nil,
      bucketWidth = 50L).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 4L, 5L)) // 100 in, 199 in, 200 out
  }

  test("empty and inverted intervals match nothing; overlapping intervals both match") {
    val iv = Seq(
      (10L, 100L, 100L),  // empty
      (11L, 200L, 100L),  // inverted
      (12L, 140L, 160L),  // overlaps 13
      (13L, 150L, 260L)
    ).toDF("iv", "lo", "hi")
    val got = IntervalJoin.overlap(probe, "t", iv, "lo", "hi", Nil, 50L)
      .select("iv", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((12L, 4L), (13L, 4L), (13L, 5L), (13L, 6L)))
  }

  test("equi-keys restrict matches across keys") {
    val p = Seq((1L, "a", 150L), (2L, "b", 150L)).toDF("id", "pk", "t")
    val iv = Seq(("a", 100L, 200L)).toDF("ik", "lo", "hi")
    val got = IntervalJoin.overlap(p, "t", iv, "lo", "hi",
      keys = Seq("pk" -> "ik"), bucketWidth = 50L)
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("long-tail broadcast path: a many-bucket interval matches exactly once per contained row") {
    val iv = Seq(
      (20L, 0L, 1000L),   // spans 20 buckets at width 50 -> long path
      (21L, 100L, 200L)   // short path
    ).toDF("iv", "lo", "hi")
    val got = IntervalJoin.overlap(probe, "t", iv, "lo", "hi", Nil, 50L)
      .groupBy("iv").count().as[(Long, Long)].collect().toMap
    // iv 20 contains t in [0,1000): ids 1..6 (t=1000 excluded), each ONCE
    assert(got == Map(20L -> 6L, 21L -> 3L))
  }

  test("negative times floor-divide into buckets correctly") {
    val p = Seq((1L, -75L), (2L, -50L), (3L, -1L), (4L, 0L)).toDF("id", "t")
    val iv = Seq((30L, -60L, 10L)).toDF("iv", "lo", "hi")
    val got = IntervalJoin.overlap(p, "t", iv, "lo", "hi", Nil, 50L)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L, 4L))
  }

  test("working-column and overlapping-name guards") {
    val bad = probe.withColumnRenamed("id", "__iv_x")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(bad, "t", Seq((1L, 2L, 3L)).toDF("iv", "lo", "hi"),
        "lo", "hi", Nil, 50L)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(probe, "t", Seq((1L, 2L, 3L)).toDF("t", "lo", "hi"),
        "lo", "hi", Nil, 50L)
    }
  }

  test("bucketed rewrite == naive theta join on harness events (sf0.001)") {
    val ev = graft.Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
    val inc = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        col("t_us").as("start_us"),
        (col("t_us") + lit(600000000L)).as("end_us"))
    val probeH = ev.select(col("event_id"), col("t_us"))
    val fast = IntervalJoin.overlap(probeH, "t_us", inc,
        "start_us", "end_us", Nil, 600000000L)
      .select("incident_id", "event_id").as[(Long, Long)].collect().toSet
    val naive = probeH.join(inc,
        col("t_us") >= col("start_us") && col("t_us") < col("end_us"))
      .select("incident_id", "event_id").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("plan: short path is an equi-join, never a cartesian; dead long branch collapses under AQE") {
    val df = JoinQueries.qIntervalJoin(spark, sf001)
    df.collect()
    // AQE's toString carries the pre-adaptive plan under "== Initial
    // Plan ==" (where the not-yet-pruned nested-loop branch is expected
    // text); what actually ran is the final-plan section above it.
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), s"cartesian in final plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join in final plan:\n$p")
    // every harness interval is exactly one bucket wide (span <= 2), so
    // the long-tail side is empty and AQE's empty-relation propagation
    // must prune the whole nested-loop branch AND its union, leaving
    // exactly the two real scans (probe + incidents)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"dead long-tail branch survived AQE:\n$p")
    assert("FileScan".r.findAllIn(p).length == 2,
      s"expected exactly 2 scans in final plan:\n$p")
    // exact long bucket math — the floor-div must never detour through
    // a double division (ulp loss past 2^53)
    assert(!p.contains("as double) / 6.0E8"), s"double division in plan:\n$p")
  }
}
