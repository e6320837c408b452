package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

class SaltedWindowSpec extends SparkSpec {

  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("rank").toInt).toMap

  test("two-level rank == naive window on a pathologically skewed group") {
    // group "hub" holds 10k rows, "tail" 10 — the shape where the naive
    // per-group window serializes the hub into one sort task
    val df = ((0L until 10000L).map(i => (i, "hub", (i * 7919 % 1000).toDouble))
      ++ (10000L until 10010L).map(i => (i, "tail", i.toDouble)))
      .toDF("id", "g", "v")
    val got = SaltedWindow.groupedRank(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank").toInt).toMap
    val want = naive(df)
    assert(got == want, "two-level ranking diverges from the naive window")
  }

  test("ties: equal values share a bucket, id tie-break matches the naive window") {
    // many exact ties, including across would-be bucket boundaries
    val df = (0L until 1000L).map(i => (i, "g", (i % 7).toDouble)).toDF("id", "g", "v")
    val got = SaltedWindow.groupedRank(df, "g", "v", "id", buckets = 16)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank").toInt).toMap
    assert(got == naive(df))
  }

  test("degenerate constant column: everything lands in one bucket, still correct") {
    val df = (0L until 100L).map(i => (i, "g", 5.0)).toDF("id", "g", "v")
    val got = SaltedWindow.groupedRank(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank").toInt).toMap
    assert(got == naive(df))
  }

  test("ascending order matches the naive ASC window") {
    val df = ((0L until 5000L).map(i => (i, "hub", (i * 31 % 997).toDouble))
      ++ (5000L until 5010L).map(i => (i, "tail", i.toDouble)))
      .toDF("id", "g", "v")
    val got = SaltedWindow.groupedRank(df, "g", "v", "id", ascending = true)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank").toInt).toMap
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc_nulls_last, col("id"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("rank").toInt).toMap
    assert(got == want)
  }

  test("NULL sort values rank last in both directions (DuckDB NULLS LAST semantics)") {
    val rows = (0L until 100L).map(i =>
      (i, "g", if (i % 10 == 0) None else Some((i * 13 % 50).toDouble)))
    val df = rows.toDF("id", "g", "v")
    for (asc <- Seq(true, false)) {
      val sortKey = if (asc) col("v").asc_nulls_last else col("v").desc_nulls_last
      val want = df.withColumn("rank", row_number().over(
          Window.partitionBy(col("g")).orderBy(sortKey, col("id"))))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("rank").toInt).toMap
      val got = SaltedWindow.groupedRank(df, "g", "v", "id", ascending = asc)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank").toInt).toMap
      assert(got == want, s"null routing diverges (ascending=$asc)")
    }
  }

  test("groupedRankWithTotal: group_n is the exact per-group count on every row") {
    val df = ((0L until 300L).map(i => (i, "a", i.toDouble))
      ++ (300L until 310L).map(i => (i, "b", i.toDouble))).toDF("id", "g", "v")
    val out = SaltedWindow.groupedRankWithTotal(df, "g", "v", "id", buckets = 8)
      .collect()
    assert(out.length == 310)
    out.foreach { r =>
      val expected = if (r.getAs[String]("g") == "a") 300L else 10L
      assert(r.getAs[Long]("group_n") == expected)
    }
    // ranks within each group are a permutation of 1..n
    val aRanks = out.filter(_.getAs[String]("g") == "a").map(_.getAs[Long]("rank")).sorted
    assert(aRanks.toSeq == (1L to 300L))
  }

  test("plan: the row-stream window partitions by (group, bucket), never by group alone") {
    val df = (0L until 100L).map(i => (i, "g", i.toDouble)).toDF("id", "g", "v")
    val p = SaltedWindow.groupedRank(df, "g", "v", "id")
      .queryExecution.executedPlan.toString
    // the heavy window's partition spec must include the bucket column;
    // only the tiny offset window (over <= groups x buckets count rows)
    // may partition by the group alone
    val windowLines = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(windowLines.nonEmpty, s"no window in plan:\n$p")
    windowLines.foreach(l =>
      assert(l.contains("_bucket"), s"row-stream window not bucketed: $l"))
  }
}
