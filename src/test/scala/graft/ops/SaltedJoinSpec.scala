package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  // 90%-hot-key probe: the shape that pins a plain shuffled join
  private def fixture = {
    import spark.implicits._
    val probe = (0 until 1000).map { i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot", i * 1.5)
    }.toDF("id", "k", "v")
    val build = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 100.0) }
      .toDF("k", "dim")
    (probe, build)
  }

  test("salted join == plain join on a 90%-hot-key fixture") {
    val (probe, build) = fixture
    val salted = SaltedJoin.join(probe, build, "k", "id", buckets = 8)
      .select(col("id"), col("k"), col("v"), col("dim"))
    val plain = probe.join(build, Seq("k"))
      .select(col("id"), col("k"), col("v"), col("dim"))
    assert(salted.exceptAll(plain).count() == 0
      && plain.exceptAll(salted).count() == 0)
    assert(salted.count() == 1000, "inner join keeps every matched probe row once")
  }

  test("probe rows with no build match drop; build keys with no probe rows drop") {
    import spark.implicits._
    val probe = Seq((1L, "a", 1.0), (2L, "zzz", 2.0)).toDF("id", "k", "v")
    val build = Seq(("a", 10.0), ("unused", 20.0)).toDF("k", "dim")
    val got = SaltedJoin.join(probe, build, "k", "id", buckets = 4)
      .select(col("id"), col("dim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0)))
  }

  test("salting is deterministic: two runs produce identical placement and rows") {
    val (probe, build) = fixture
    val a = SaltedJoin.join(probe, build, "k", "id", buckets = 8)
      .orderBy(col("id")).collect().toSeq
    val b = SaltedJoin.join(probe, build, "k", "id", buckets = 8)
      .orderBy(col("id")).collect().toSeq
    assert(a == b)
  }

  test("refuses inputs that already carry a '_salt' column") {
    import spark.implicits._
    val (probe, build) = fixture
    val saltedProbe = probe.withColumn("_salt", lit(7))
    intercept[IllegalArgumentException] {
      SaltedJoin.join(saltedProbe, build, "k", "id", buckets = 4)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.join(probe, build.withColumn("_salt", lit(7)), "k", "id", buckets = 4)
    }
  }

  test("buckets = 1 degrades to the plain join, never below it") {
    val (probe, build) = fixture
    val one = SaltedJoin.join(probe, build, "k", "id", buckets = 1)
    assert(one.count() == 1000)
  }

  test("plan: build side replicates via explode; no cartesian/nested-loop") {
    val (probe, build) = fixture
    val plan = SaltedJoin.join(probe, build, "k", "id", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), "build replication must be an in-row explode")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
