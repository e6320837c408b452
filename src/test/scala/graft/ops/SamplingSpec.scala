package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.queries.ExtraQueries

class SamplingSpec extends SparkSpec {

  test("exact per-group sampling: exactly min(n, |group|) rows per group") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_linenumber", "l_returnflag")
    val groupSizes = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 500
    val sampled = Sampling.exactPerGroup(li, "l_returnflag", n, seed = 7L,
      tieBreak = Seq(col("l_orderkey"), col("l_linenumber")))
    val got = sampled.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    groupSizes.foreach { case (g, sz) =>
      assert(got(g) == math.min(n.toLong, sz), s"group $g: ${got(g)}")
    }
  }

  test("sampled rows are a subset of the input; repeated runs identical") {
    val a = ExtraQueries.qSampleReservoir(spark, sf001).collect().map(_.toString).toSeq
    val b = ExtraQueries.qSampleReservoir(spark, sf001).collect().map(_.toString).toSeq
    assert(a == b, "seeded sampling must be reproducible for a fixed layout")
    val all = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"), col("l_returnflag"))
      .collect().map(_.toString).toSet
    assert(a.forall(all.contains))
  }
}
