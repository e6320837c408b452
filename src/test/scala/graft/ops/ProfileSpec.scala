package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("one-pass profile: nulls, exact distinct, numeric min/max, string rules") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, Option[Double], Option[String])](
      (1L, Some(2.0), Some("a")), (2L, Some(2.0), Some("b")),
      (3L, None, Some("a")), (4L, Some(-1.5), None), (5L, None, None))
      .toDF("id", "v", "s")
    val prof = Profile.profile(df, Seq("id" -> true, "v" -> true, "s" -> false))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(prof("id") == ((0L, 5L, Some(1.0), Some(5.0))))
    assert(prof("v") == ((2L, 2L, Some(-1.5), Some(2.0))))
    // string column: null min/max by contract (never hash a rendering)
    assert(prof("s") == ((2L, 2L, None, None)))
  }

  test("approx tier matches exact counts at fixture cardinalities and plans no Expand") {
    val li = graft.Tables.lineitem(spark, sf001)
    val cols = Seq("l_returnflag" -> false, "l_linestatus" -> false)
    val exact = Profile.profile(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Profile.profile(li, cols, approx = true).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // 2-3 distinct values: HLL is exact at this cardinality
    assert(exact == approx)
    val plan = Profile.profile(li, cols, approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx path must not fan out through Expand")
  }
}
