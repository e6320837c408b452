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

  test("hashed exact-per-group sample is layout-independent and skew-proof in plan") {
    val li = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey", "l_returnflag")
    val rowKey = ((col("l_orderkey") * 31L + col("l_linenumber")) * 31L
      + col("l_suppkey")) * 31L + col("l_partkey")
    val tieKey = format_string("%019d%019d%019d%019d", col("l_orderkey"),
      col("l_linenumber"), col("l_suppkey"), col("l_partkey"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.exactPerGroupHashed(df, "l_returnflag", 500, rowKey, tieKey)
        .collect().map(_.toString).sorted.toSeq
    // the sample is a pure function of the DATA: any physical layout
    // produces the identical row set (rand(seed) fails exactly this)
    val base = run(li)
    assert(base == run(li.repartition(13)) &&
      base == run(li.orderBy(col("l_partkey").desc)),
      "hashed sample must not depend on partitioning or row order")
    // and the ranking is the two-level bucketed plan, never a
    // single-task whole-group window over the hot flag groups
    val plan = Sampling.exactPerGroupHashed(li, "l_returnflag", 500, rowKey, tieKey)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_bucket"), s"expected the bucketed ranking:\n$plan")
  }

  test("hash-stratified sample is layout-independent and hits its nominal fractions") {
    // each row's fate is a pure function of its key, so repartitioning
    // the input must select the SAME rows — the property a rand-stream
    // sample cannot give, and the point of the hash tier
    val base = ExtraQueries.qSampleHashStratified(spark, sf001)
      .collect().map(_.toString).toSeq
    val li = Tables.lineitem(spark, sf001)
    val spark2 = spark
    import spark2.implicits._
    val repartitioned = li.repartition(7, col("l_partkey"))
    // replay the query body over the shuffled layout
    val key = col("l_orderkey") * lit(7L) + col("l_linenumber")
    val bucket = ((key % lit(1000003L)) * lit(2654435761L)) % lit(1000000L)
    val again = repartitioned.withColumn("bucket", bucket)
      .filter(col("bucket") <
        when(col("l_returnflag") === "A", lit(100000L))
          .when(col("l_returnflag") === "N", lit(50000L))
          .when(col("l_returnflag") === "R", lit(100000L))
          .otherwise(lit(0L)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"))
      .collect().map(_.toString).toSeq
    assert(base == again, "hash sampling must not depend on partition layout")
    // nominal fractions hold within multiplicative-hash wobble (±50%)
    val strata = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = ExtraQueries.qSampleHashStratified(spark, sf001)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Map("A" -> 0.10, "N" -> 0.05, "R" -> 0.10).foreach { case (f, frac) =>
      val expected = strata(f) * frac
      assert(got(f) > expected * 0.5 && got(f) < expected * 1.5,
        s"stratum $f: ${got(f)} vs nominal $expected")
    }
  }

  test("weighted sampling (A-ES): heavy-weight rows dominate, light rows still possible, deterministic") {
    import spark.implicits._
    // 1000 rows: ids 0..49 weight 1000, the rest weight 1 — the heavy
    // 5% should own most of the top-100 sample but NOT all of it
    val df = (0L until 1000L)
      .map(i => (i, if (i < 50) 1000.0 else 1.0)).toDF("id", "w")
    val out = Sampling.weightedTopK(df, col("id"), col("w"), k = 100,
      tieBreak = Seq(col("id"))).collect().map(_.getLong(0))
    assert(out.length == 100)
    val heavy = out.count(_ < 50L)
    assert(heavy >= 45, s"heavy rows underrepresented: $heavy/50 sampled")
    assert(heavy < out.length, "light rows must still be able to appear")
    // deterministic: a second draw is identical (hash keys, no RNG)
    val again = Sampling.weightedTopK(df, col("id"), col("w"), k = 100,
      tieBreak = Seq(col("id"))).collect().map(_.getLong(0))
    assert(out.toSeq == again.toSeq)
    // non-positive weights are excluded, never sampled
    val withZero = (0L until 10L).map(i => (i, if (i == 3L) 0.0 else 1.0)).toDF("id", "w")
    val z = Sampling.weightedTopK(withZero, col("id"), col("w"), k = 10,
      tieBreak = Seq(col("id"))).collect().map(_.getLong(0))
    assert(!z.contains(3L) && z.length == 9)
  }
}
