package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WelfordVarSpec extends SparkSpec {

  private def twoPass(xs: Seq[Double]): (Double, Double) = {
    val n = xs.length
    val mean = xs.sum / n
    val varS = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    (mean, varS)
  }

  test("grouped Welford == two-pass reference on a mixed fixture") {
    import spark.implicits._
    val data = (0 until 500).map(i => (s"g${i % 3}", (i * 37 % 101) * 0.25))
    val ds = data.toDF("g", "x").as[(String, Double)]
    val agg = new WelfordVar[(String, Double)](_._2)
    val got = ds.groupByKey(_._1).agg(agg.toColumn.name("w"))
      .collect().map { case (g, s) =>
        g -> ((s.n, s.mean, WelfordVar.sampleVariance(s).get))
      }.toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val xs = rows.map(_._2)
      val (m, v) = twoPass(xs)
      val (n, gm, gv) = got(g)
      assert(n == xs.length)
      assert(math.abs(gm - m) <= 1e-12 * math.max(1, math.abs(m)))
      assert(math.abs(gv - v) <= 1e-9 * math.max(1, v), s"group $g: $gv vs $v")
    }
  }

  test("catastrophic cancellation: 1e8-offset noise keeps full precision; naive spelling collapses") {
    import spark.implicits._
    // unit-spread values riding a 1e8 offset: true sample variance of
    // (0.0, 0.5, 1.0, ...) pattern is offset-invariant
    val base = (0 until 1000).map(i => (i % 5) * 0.5)
    val offset = 1e8
    val shifted = base.map(_ + offset)
    val (_, trueVar) = twoPass(base) // exact in the small domain
    val ds = shifted.map(("k", _)).toDF("g", "x").as[(String, Double)]
    val agg = new WelfordVar[(String, Double)](_._2)
    val s = ds.groupByKey(_._1).agg(agg.toColumn.name("w")).collect().head._2
    val welford = WelfordVar.sampleVariance(s).get
    assert(math.abs(welford - trueVar) <= 1e-6 * trueVar,
      s"Welford lost precision at offset: $welford vs $trueVar")
    // the E[x²]−E[x]² spelling at the same offset: Σx² ≈ 1e19 has ulp
    // ≈ 2e3, swamping a variance of ~0.3 — demonstrate the collapse
    val n = shifted.length
    val sx = shifted.sum
    val sxx = shifted.map(x => x * x).sum
    val naive = (sxx - sx * sx / n) / (n - 1)
    assert(math.abs(naive - trueVar) > 0.01 * trueVar,
      s"expected the naive spelling to collapse at 1e8 offset, got $naive vs $trueVar")
  }

  test("singleton and empty states yield None, matching stddev_samp's NULL") {
    val agg = new WelfordVar[Double](identity)
    assert(WelfordVar.sampleVariance(agg.zero).isEmpty)
    assert(WelfordVar.sampleVariance(agg.reduce(agg.zero, 42.0)).isEmpty)
    assert(WelfordVar.sampleStddev(agg.reduce(agg.zero, 42.0)).isEmpty)
    assert(WelfordVar.sampleVariance(
      agg.reduce(agg.reduce(agg.zero, 1.0), 3.0)).contains(2.0))
  }

  test("merge is order-insensitive: permuted partitionings agree bit-for-bit-ish") {
    val agg = new WelfordVar[Double](identity)
    val xs = (0 until 300).map(i => (i * 7919 % 997) * 0.125)
    def fold(order: Seq[Seq[Double]]): WelfordState =
      order.map(part => part.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
    val a = fold(xs.grouped(50).toSeq)
    val b = fold(xs.grouped(50).toSeq.reverse)
    val c = fold(xs.grouped(17).toSeq)
    assert(a.n == b.n && b.n == c.n)
    Seq(b, c).foreach { s =>
      assert(math.abs(s.mean - a.mean) <= 1e-12 * math.max(1, math.abs(a.mean)))
      assert(math.abs(s.m2 - a.m2) <= 1e-9 * math.max(1, a.m2))
    }
  }
}
