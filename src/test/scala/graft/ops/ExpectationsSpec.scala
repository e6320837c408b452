package graft.ops

import graft.SparkSpec
import graft.ops.Expectations._
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {

  import spark.implicits._

  test("empty table FAILS every check (fail-closed gate, not a silent pass)") {
    val empty = Seq.empty[(Int, String)].toDF("id", "name")
    val rep = Expectations.report(empty, Seq(
      Complete("id"), Unique("id"), InRange("id", 0, 100),
      InSet("name", Seq("a")), Satisfies("nonneg", col("id") >= 0),
      Size(1))).collect()
    assert(rep.length == 6)
    rep.foreach { r =>
      assert(r.getAs[Double]("violation_fraction") == 1.0,
        s"${r.getAs[String]("check")} must read 1.0 on empty input")
      assert(!r.getAs[Boolean]("passed"),
        s"${r.getAs[String]("check")} must FAIL on empty input")
    }
  }

  test("all-NULL column: Unique is vacuously clean, Complete catches the NULLs") {
    val df = Seq[(Integer, String)]((null, "x"), (null, "y"))
      .toDF("id", "name")
    val rep = Expectations.report(df, Seq(Unique("id"), Complete("id")))
      .collect().map(r => r.getAs[String]("check") ->
        (r.getAs[Double]("violation_fraction"), r.getAs[Boolean]("passed"))).toMap
    // the unguarded form reads 0/0 = NaN here — engines disagree on NaN
    assert(rep("unique(id)") == ((0.0, true)))
    assert(rep("complete(id)") == ((1.0, false)))
  }

  test("Size gates row count; duplicate and range violations read as fractions") {
    val df = Seq((1, 5.0), (1, 5.0), (2, 99.0), (3, -1.0)).toDF("id", "v")
    val rep = Expectations.report(df, Seq(
      Size(10), Unique("id"), InRange("v", 0.0, 50.0, tolerance = 0.3)))
      .collect().map(r => r.getAs[String]("check") ->
        (r.getAs[Double]("violation_fraction"), r.getAs[Boolean]("passed"))).toMap
    assert(rep("size(>=10)") == ((1.0, false)))
    assert(rep("unique(id)") == ((0.25, false)))   // 3 distinct / 4 rows
    // 2 of 4 rows out of range = 0.5 > 0.3 budget
    assert(rep("in_range(v)") == ((0.5, false)))
  }

  test("clean table passes, including Size at the exact boundary") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val rep = Expectations.report(df, Seq(
      Size(2), Unique("id"), Complete("name"))).collect()
    assert(rep.forall(_.getAs[Boolean]("passed")))
  }
}
