package graft.gsod

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class StatsApproxSpec extends SparkSpec {

  test("describeApprox tracks exact describe within sketch error") {
    val li = Tables.lineitem(spark, sf01)
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = Stats.describe(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Stats.describeApprox(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // mean/stddev agree up to float summation order
      assert(math.abs(a.getDouble(1) - e.getDouble(1)) < 1e-9 * math.abs(e.getDouble(1)))
      assert(math.abs(a.getDouble(2) - e.getDouble(2)) < 1e-9 * math.abs(e.getDouble(2)))
      val (em, am) = (e.getDouble(3), a.getDouble(3))
      assert(math.abs(am - em) / math.max(1.0, math.abs(em)) < 0.05,
        s"$c approx median $am vs exact $em")
      val (ed, ad) = (e.getLong(5).toDouble, a.getLong(4).toDouble)
      assert(math.abs(ad - ed) / ed < 0.1, s"$c approx distinct $ad vs exact $ed")
    }
  }

  test("float32 parity mode reproduces the reference's float round-trip") {
    val df = Fixture.tiny(spark, Seq[java.lang.Double](0.1, 0.3, null))
    val (exact, _) = Impute.medianImputer(df, "v")
    val (parity, _) = Impute.medianImputer(df, "v", float32Parity = true)
    val median = 0.2 // median of (0.1, 0.3) — not float-representable
    val e = exact.orderBy("date").collect().map(_.getDouble(2)).last
    val p = parity.orderBy("date").collect().map(_.getDouble(2)).last
    assert(e == (0.1 + 0.3) / 2)
    assert(p == 0.2f.toDouble) // float32-truncated
    assert(p != e, "parity mode must differ on non-representable values")
    assert(math.abs(p - median) < 1e-7)
  }
}
