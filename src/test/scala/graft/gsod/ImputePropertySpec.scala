package graft.gsod

import java.sql.Date
import java.time.LocalDate
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based imputation invariants (SURVEY.md §5.2.2) using
  * ScalaCheck generators with fixed seeds (plain scalacheck — the
  * scalatestplus bridge isn't in the offline dependency cache):
  * for arbitrary null patterns, the imputers must leave no nulls (as
  * long as any non-null value exists), pass non-null inputs through
  * unchanged, and fill only with values inside the observed range.
  */
class ImputePropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("stn", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("v", DoubleType, nullable = true)))

  private def frame(values: Seq[Option[Double]]) = {
    val base = LocalDate.of(2023, 3, 1)
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row("000042", Date.valueOf(base.plusDays(i.toLong)), v.map(Double.box).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2), schema)
  }

  private val genValues: Gen[List[Option[Double]]] =
    Gen.chooseNum(2, 40).flatMap { n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.const(Option.empty[Double]),
        Gen.chooseNum(-50.0, 120.0).map(d => Some(math.rint(d * 10) / 10))))
    }

  /** Deterministic samples: one per seed, discarding all-null draws. */
  private def samples(count: Int): Seq[List[Option[Double]]] =
    (1 to count * 3).iterator
      .flatMap(i => genValues(Gen.Parameters.default, Seed(i.toLong)))
      .filter(_.exists(_.isDefined))
      .take(count).toSeq

  test("proximityMedian: no nulls out; non-nulls unchanged; fills within [min,max]") {
    samples(12).foreach { values =>
      val df = frame(values)
      val (out, _) = Impute.proximityMedian(df, "v", initialNumDays = 2, maxDays = 4)
      val got = out.orderBy("date").collect().map(r =>
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      assert(got.forall(_.isDefined), s"nulls survived for input $values")
      values.zip(got).foreach {
        case (Some(in), Some(o)) => assert(in == o, s"changed $in -> $o")
        case _ =>
      }
      val defined = values.flatten
      val (lo, hi) = (defined.min, defined.max)
      got.flatten.foreach(v => assert(v >= lo - 1e-9 && v <= hi + 1e-9,
        s"$v outside [$lo,$hi] for input $values"))
    }
  }

  test("medianImputer: fills with the exact median of odd-sized groups") {
    Seq(3, 7, 11, 21).foreach { n =>
      val values = (1 to n).map(i => Some(i.toDouble)) :+ None
      val df = frame(values)
      val (out, _) = Impute.medianImputer(df, "v")
      val got = out.orderBy("date").collect().map(_.getDouble(2))
      // the null row (last) gets the station median of 1..n = (n+1)/2
      assert(got.last == (n + 1) / 2.0, s"median of 1..$n gave ${got.last}")
    }
  }

  test("zeroFill: idempotent; exactly the null positions become 0") {
    samples(8).foreach { values =>
      val df = frame(values)
      val once = Impute.zeroFill(df, "v")
      val twice = Impute.zeroFill(once, "v")
      val a = once.orderBy("date").collect().map(_.getDouble(2)).toSeq
      val b = twice.orderBy("date").collect().map(_.getDouble(2)).toSeq
      assert(a == b)
      values.zip(a).foreach {
        case (None, got) => assert(got == 0.0)
        case (Some(in), got) => assert(got == in)
      }
    }
  }

  test("seasonalMedian: fill equals per-month median of surviving values") {
    // 11 March values 10..20 with two nulls -> month median of the 9
    // non-null values
    val values = Seq(Some(10.0), None, Some(12.0), Some(13.0), Some(14.0),
      Some(15.0), Some(16.0), None, Some(18.0), Some(19.0), Some(20.0))
    val (out, _) = Impute.seasonalMedian(frame(values), "v")
    val got = out.orderBy("date").collect().map(_.getDouble(2))
    val nonNull = values.flatten.sorted
    val expected = nonNull(nonNull.size / 2) // odd count -> middle
    assert(got(1) == expected && got(7) == expected)
  }
}
