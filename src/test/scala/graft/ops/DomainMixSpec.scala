package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.ExtraQueries

class DomainMixSpec extends SparkSpec {

  import spark.implicits._

  test("resample: the scarcest source caps the output, composition is exact") {
    // a has 2 rows but wants 50% of the mix -> O = min(2*1000//500,
    // 6*1000//500) = 4; each source contributes exactly 2
    val df = (Seq((0L, "a"), (1L, "a")) ++ (2L until 8L).map(_ -> "b"))
      .toDF("id", "source")
    val out = DomainMix.resample(df, "source", "id", Map("a" -> 500L, "b" -> 500L))
      .collect().map(r => r.getAs[String]("source"))
    assert(out.length == 4)
    assert(out.count(_ == "a") == 2 && out.count(_ == "b") == 2)
  }

  test("resample: unlisted sources are dropped; quotas use integer floor") {
    val df = ((0L until 10L).map(_ -> "x") ++ (10L until 20L).map(_ -> "y")
      ++ (20L until 25L).map(_ -> "junk")).toDF("id", "source")
    // O = min(10*1000//300, 10*1000//700) = min(33, 14) = 14
    // take_x = 14*300//1000 = 4, take_y = 14*700//1000 = 9
    val out = DomainMix.resample(df, "source", "id", Map("x" -> 300L, "y" -> 700L))
      .collect().map(r => r.getAs[String]("source"))
    assert(out.count(_ == "x") == 4 && out.count(_ == "y") == 9)
    assert(!out.contains("junk"))
  }

  test("resample: a target source with zero observed rows forces the empty output") {
    // the only subset honoring a 50/50 (a, ghost) target when ghost has
    // no rows is the empty set — the share map is the join spine, so
    // the missing source enters the cap as n_s = 0 instead of vanishing
    val df = Seq((0L, "a"), (1L, "a"), (2L, "a")).toDF("id", "source")
    val out = DomainMix.resample(df, "source", "id",
      Map("a" -> 500L, "ghost" -> 500L))
    assert(out.count() == 0, "non-empty output cannot honor the target mix")
  }

  test("resample rejects shares that don't sum to 1000") {
    val df = Seq((0L, "a")).toDF("id", "source")
    intercept[IllegalArgumentException] {
      DomainMix.resample(df, "source", "id", Map("a" -> 999L))
    }
  }

  test("q_domain_mix on the harness corpus: composition matches the target, deterministic") {
    val a = ExtraQueries.qDomainMix(spark, sf001).collect()
    val b = ExtraQueries.qDomainMix(spark, sf001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // pure function of the data
    val bySrc = a.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    val n = bySrc.values.sum
    // uniform 20-source corpus: the tail (share 20/1000) is scarcest
    // relative to nothing — head sources cap at their 100-permille
    // quota; verify each source's count == O*share//1000 exactly
    val counts = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shares = ExtraQueries.DomainShares.toMap
    val o = shares.map { case (s, p) => counts(s) * 1000L / p }.min
    shares.foreach { case (s, p) =>
      assert(bySrc.getOrElse(s, 0) == (o * p / 1000L).toInt,
        s"source $s: got ${bySrc.getOrElse(s, 0)}, want ${o * p / 1000L} (O=$o)")
    }
    assert(n > 0)
  }

  test("isqrt: exact at perfect squares and their neighbours, incl. large magnitudes") {
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 999999L, 1000000L, 1000001L,
      (1L << 31) * (1L << 31) - 1, (1L << 31) * (1L << 31)) ++
      Seq(4503599627370496L /* 2^52 */, 4503599627370497L)
    val got = ns.toDF("n").select(col("n"), DomainMix.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val s = got(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("temperature resample: quotas bounded, within budget, tail over-represented vs proportional") {
    // head source 900 rows, tail sources 100 and 25 rows
    val df = ((0L until 900L).map(_ -> "head") ++ (900L until 1000L).map(_ -> "mid")
      ++ (1000L until 1025L).map(_ -> "tail")).toDF("id", "source")
    val out = DomainMix.resampleTemperature(df, "source", "id",
      DomainMix.corpusFraction(4)).collect() // budget = 1025/4 = 256
    val bySrc = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    // exact integer replay: w = isqrt(n) = 30, 10, 5 (tw = 45);
    // take_s = min(n_s, 256*w div 45) = 170, 56, 25
    assert(bySrc("head") == 170 && bySrc("mid") == 56 && bySrc("tail") == 25, bySrc.toString)
    assert(out.length <= 256)
    // α = 1/2 upweights the tail relative to proportional sampling:
    // tail share of output > tail share of corpus
    assert(bySrc("tail").toDouble / out.length > 25.0 / 1025.0)
    assert(bySrc("head").toDouble / out.length < 900.0 / 1025.0)
    // deterministic pure function of the data
    val again = DomainMix.resampleTemperature(df, "source", "id",
      DomainMix.corpusFraction(4)).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
