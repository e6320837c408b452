package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  /** O(N²) ground truth, straight from the strict-dominance
    * definition: p survives iff no q has q.x < p.x AND q.y > p.y. */
  private def naive(pts: Seq[(Long, Long, Double)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) => qx < x && qy > y }
    }.map(_._1).toSet

  private def frontier(pts: Seq[(Long, Long, Double)]): Set[Long] = {
    import spark.implicits._
    Skyline.frontier2d(pts.toDF("id", "x", "y"), "x", "y")
      .select(col("id")).collect().map(_.getLong(0)).toSet
  }

  test("matches the NOT-EXISTS definition on a deterministic pseudo-random set") {
    // LCG keeps the fixture seed-free of java.util.Random implementation
    val pts = (0 until 400).map { i =>
      val x = (i * 48271 % 97).toLong
      val y = ((i * 16807 + 3) % 101).toDouble
      (i.toLong, x, y)
    }
    assert(frontier(pts) == naive(pts))
  }

  test("ties survive together: same x keeps all max-y rows, equal y across x kept") {
    val pts = Seq(
      (1L, 0L, 5.0), (2L, 0L, 5.0),  // tie on both axes at the min x
      (3L, 1L, 5.0),                 // equal y at later x: NOT strictly dominated
      (4L, 1L, 4.0),                 // dominated by 1/2
      (5L, 2L, 6.0))                 // new best y
    assert(frontier(pts) == Set(1L, 2L, 3L, 5L))
  }

  test("monotone staircase keeps everything; reverse staircase keeps only the first") {
    val up = (0L until 10L).map(i => (i, i, i.toDouble))       // y rises with x
    assert(frontier(up.map(t => (t._1, t._2, t._3))) == up.map(_._1).toSet)
    val down = (0L until 10L).map(i => (i, i, -i.toDouble))    // y falls with x
    assert(frontier(down) == Set(0L))
  }

  test("plan: per-x pre-aggregate, no self-join, no whole-relation sort") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, (i % 13).toLong, i.toDouble))
      .toDF("id", "x", "y")
    val plan = Skyline.frontier2d(df, "x", "y").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "frontier threshold must come from groupBy(x)")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "skyline must never plan as an all-pairs join")
  }
}
