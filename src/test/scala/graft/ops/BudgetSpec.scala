package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BudgetSpec extends SparkSpec {

  import spark.implicits._

  test("selectByBudget: hand-built corpus keeps the greedy quality prefix") {
    // quality DESC order: 3 (1.0, w5), 1 (0.8, w10), 4 (0.5, w20), 2 (0.2, w40)
    // total = 75; budget 1/3 -> 25: cum 5, 15, 35(x) -> keep 3 and 1 only.
    val df = Seq((1L, 0.8, 10L), (2L, 0.2, 40L), (3L, 1.0, 5L), (4L, 0.5, 20L))
      .toDF("id", "q", "w")
    val got = Budget.selectByBudget(df, "q", "w", "id", num = 1L, den = 3L)
      .orderBy("id").select("id", "cum_weight").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 15L), (3L, 5L)))
  }

  test("selectByBudget: two-level scan == naive global-window cumsum") {
    // Deterministic pseudo-random corpus incl. heavy ties (the skew
    // case that lands many rows in one bucket) and zero weights.
    val df = (0 until 500).map { i =>
      val q = (i * 131 % 97) / 96.0 // many exact collisions
      val w = (i * 17 % 13).toLong
      (i.toLong, q, w)
    }.toDF("id", "q", "w")
    def naive(numDen: (Long, Long)) = {
      val cum = sum(col("w")).over(
        Window.orderBy(col("q").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val total = df.agg(sum(col("w"))).as[Long].head()
      df.withColumn("cum", cum)
        .filter(col("cum") * numDen._2 <= lit(total) * numDen._1)
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toSet
    }
    for (nd <- Seq((1L, 4L), (1L, 2L), (3L, 4L)); buckets <- Seq(1, 8, 1024)) {
      val got = Budget
        .selectByBudget(df, "q", "w", "id", nd._1, nd._2, buckets)
        .select(col("id"), col("cum_weight")).as[(Long, Long)].collect().toSet
      assert(got == naive(nd), s"fraction $nd buckets $buckets")
    }
  }

  test("selectByBudget: degenerate budgets select nothing / everything") {
    val df = Seq((1L, 0.9, 10L), (2L, 0.1, 10L)).toDF("id", "q", "w")
    assert(Budget.selectByBudget(df, "q", "w", "id", 0L, 1L).count() == 0L)
    assert(Budget.selectByBudget(df, "q", "w", "id", 1L, 1L).count() == 2L)
  }

  test("selectByBudget: big-corpus window never plans a global single-partition sort") {
    val df = (0 until 100).map(i => (i.toLong, i / 99.0, 1L)).toDF("id", "q", "w")
    val plan = Budget.selectByBudget(df, "q", "w", "id", 1L, 2L)
      .queryExecution.executedPlan.toString
    // Every Window over the row stream must be keyed by the range
    // bucket; only the `buckets`-row offset table may sort globally.
    val rowWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("_intra")).toSeq
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("_bucket")), plan)
  }
}
