package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.QualityQueries

class SnapshotDiffSpec extends SparkSpec {

  private def classes(rows: Seq[(Long, Option[String], Option[java.lang.Double])],
                      rows2: Seq[(Long, Option[String], Option[java.lang.Double])]) = {
    import spark.implicits._
    val a = rows.toDF("k", "s", "v")
    val b = rows2.toDF("k", "s", "v")
    SnapshotDiff.diff(a, b, Seq("k"), Seq("s", "v"))
      .select(col("k"), col("diff_class"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("all four classes on a hand-built pair of snapshots") {
    val got = classes(
      Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)),
        (3L, Some("c"), Some(3.0)), (4L, Some("d"), Some(4.0))),
      Seq((1L, Some("a"), Some(1.0)),            // unchanged
        (2L, Some("B"), Some(2.0)),              // changed (string col)
        (3L, Some("c"), Some(9.0)),              // changed (double col)
        (5L, Some("e"), Some(5.0))))             // added; 4 removed
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("null-safe compare: null==null is unchanged, null vs value is changed") {
    val got = classes(
      Seq((1L, None, None), (2L, Some("x"), None), (3L, None, Some(1.0))),
      Seq((1L, None, None),                       // all-null both sides
        (2L, None, None),                         // value -> null
        (3L, None, Some(1.0))))                   // unchanged with a null col
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged"))
    // an all-null row is still PRESENT: it must never read as added/removed
    assert(!got.values.exists(c => c == "added" || c == "removed"))
  }

  test("q_snapshot_diff: classes partition the key space consistently") {
    val out = QualityQueries.qSnapshotDiff(spark, sf001).cache()
    val byClass = out.groupBy("diff_class").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the derived snapshots guarantee every class is non-empty
    assert(Seq("added", "removed", "changed").forall(c => byClass.getOrElse(c, 0L) > 0))
    // added rows have no old side; removed rows no new side; changed both
    assert(out.filter(col("diff_class") === "added" && col("old_price").isNotNull).count() == 0)
    assert(out.filter(col("diff_class") === "removed" && col("new_price").isNotNull).count() == 0)
    assert(out.filter(col("diff_class") === "changed" &&
      (col("old_price").isNull || col("new_price").isNull)).count() == 0)
    out.unpersist()
  }
}
