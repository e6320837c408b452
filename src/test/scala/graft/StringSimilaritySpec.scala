package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{JaroWinklerAlgo, StringSimilarity}

/** Canonical Jaro–Winkler vectors (Winkler '90 / the census
  * comparator literature) + expression-level semantics. */
class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical literature vectors") {
    // MARTHA/MARHTA: m=6, t=1, jaro=(1+1+5/6)/3, l=3
    val jaroMartha = (1.0 + 1.0 + 5.0 / 6.0) / 3.0
    assert(jw("MARTHA", "MARHTA") == jaroMartha + 3 * 0.1 * (1 - jaroMartha))
    // DWAYNE/DUANE: m=4, t=0, jaro=(4/6+4/5+1)/3, l=1
    val jaroDwayne = (4.0 / 6 + 4.0 / 5 + 1.0) / 3.0
    assert(jw("DWAYNE", "DUANE") == jaroDwayne + 1 * 0.1 * (1 - jaroDwayne))
    // DIXON/DICKSONX: m=4, t=0, jaro=(4/5+4/8+1)/3, l=2
    val jaroDixon = (4.0 / 5 + 4.0 / 8 + 1.0) / 3.0
    assert(jw("DIXON", "DICKSONX") == jaroDixon + 2 * 0.1 * (1 - jaroDixon))
  }

  test("identity, disjoint, and empty edges") {
    assert(jw("hello", "hello") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
  }

  test("symmetry") {
    for ((a, b) <- Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
        ("large widget", "lagre widgt")))
      assert(jw(a, b) == jw(b, a), s"asymmetric for $a/$b")
  }

  test("expression evaluates through codegen and SQL, null-safe") {
    import spark.implicits._
    StringSimilarity.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), (null, "x"), ("x", null))
      .toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")).as("s"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == jw("MARTHA", "MARHTA"))
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
    val viaSql = spark.sql(
      "SELECT jaro_winkler('DWAYNE', 'DUANE')").head().getDouble(0)
    assert(viaSql == jw("DWAYNE", "DUANE"))
  }
}
