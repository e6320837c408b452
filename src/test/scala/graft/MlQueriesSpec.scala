package graft

import org.apache.spark.sql.functions._
import graft.queries.MlQueries

class MlQueriesSpec extends SparkSpec {

  test("indexed features: StringIndexer mapping == count-desc/value-asc dense rank") {
    val out = MlQueries.qMlIndexedFeatures(spark, sf001).collect()
    // independently derive the frequencyDesc contract from raw counts
    val counts = Tables.events(spark, sf001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val expected = counts.sortBy { case (v, n) => (-n, v) }.zipWithIndex
      .map { case ((v, n), i) => v -> ((i.toDouble, n)) }.toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      val (idx, n) = expected(r.getString(0))
      assert(r.getDouble(1) == idx,
        s"${r.getString(0)}: index ${r.getDouble(1)} != $idx")
      assert(r.getLong(2) == n)
    }
    // indices are a 0-based permutation
    assert(out.map(_.getDouble(1)).sorted.toSeq ==
      (0 until out.length).map(_.toDouble))
  }
}
