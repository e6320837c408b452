package graft.gsod

import java.sql.Date
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic GSOD-shaped fixture (FIXTURES.md §A) with the planted
  * scenarios the imputation semantics tests need. Lives in MAIN scope
  * because q_gsod_accounting replays the reference's printed
  * missing-count / imputation-accounting goldens (BASELINE.md
  * "Data-shape checkpoints", ipynb c8/c18/c20:out) over this fixture
  * as a driver-visible oracle row — the fixture is the query's data
  * source, not test scaffolding. Planted scenarios:
  *
  *  1. station "010020": visib null-run of 16 rows (longer than ±7,
  *     shorter than ±14) → exercises progressive widening;
  *  2. station "010010": visib null-run of 70 rows (longer than ±28) →
  *     exercises the scalar fallback;
  *  3. station "999990": temp all-sentinel → MedianImputer global
  *     fallback;
  *  4. station "010030": January `max` all-sentinel → seasonal median
  *     null → ProximityMedian fallback path;
  *  5. all stn ids carry leading zeros.
  */
object Fixture {

  val schema: StructType = StructType(Seq(
    StructField("stn", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("temp", DoubleType, nullable = true),
    StructField("visib", DoubleType, nullable = true),
    StructField("wdsp", DoubleType, nullable = true),
    StructField("mxpsd", DoubleType, nullable = true),
    StructField("max", DoubleType, nullable = true),
    StructField("min", DoubleType, nullable = true),
    StructField("prcp", DoubleType, nullable = true),
    StructField("rain_drizzle", IntegerType, nullable = true)))

  private def d(base: LocalDate, i: Int): Date = Date.valueOf(base.plusDays(i.toLong))

  /** Deterministic pseudo-value in a plausible range. */
  private def v(seed: Int, lo: Double, hi: Double): Double = {
    val x = math.abs((seed * 2654435761L) % 1000) / 1000.0
    math.rint((lo + x * (hi - lo)) * 10) / 10
  }

  def df(spark: SparkSession): DataFrame = {
    val base = LocalDate.of(2023, 1, 1)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]

    // Station 010010: 140 days; visib nulls (sentinel 999.9) rows
    // 15..124 — a 110-run. Progressive widening at k=7,14,28 eats
    // 7+14+28 = 49 rows off each end (98 total), so 12 middle rows
    // survive to the scalar fallback.
    for (i <- 0 until 140) {
      val visib = if (i >= 15 && i < 125) 999.9 else v(i + 1, 2.0, 10.0)
      rows += Row("010010", d(base, i), v(i + 11, 30.0, 60.0), visib,
        v(i + 21, 2.0, 15.0), v(i + 31, 5.0, 25.0),
        v(i + 41, 40.0, 70.0), v(i + 51, 10.0, 35.0),
        if (i % 7 == 0) 99.99 else v(i + 61, 0.0, 1.5),
        i % 3 match { case 0 => 1; case _ => 0 })
    }
    // Station 010020: 60 days; visib sentinel rows 20..35 (16-run).
    for (i <- 0 until 60) {
      val visib = if (i >= 20 && i < 36) 999.9 else v(i + 101, 1.0, 9.0)
      rows += Row("010020", d(base, i), v(i + 111, 20.0, 50.0), visib,
        if (i % 11 == 0) 999.9 else v(i + 121, 1.0, 12.0),
        v(i + 131, 4.0, 20.0),
        v(i + 141, 35.0, 65.0), v(i + 151, 5.0, 30.0),
        v(i + 161, 0.0, 2.0), i % 2)
    }
    // Station 999990: 40 days; temp all-sentinel (MedianImputer global
    // fallback); other columns clean.
    for (i <- 0 until 40) {
      rows += Row("999990", d(base, i), 9999.9, v(i + 201, 3.0, 8.0),
        v(i + 211, 2.0, 10.0), v(i + 221, 5.0, 15.0),
        v(i + 231, 45.0, 75.0), v(i + 241, 15.0, 40.0),
        v(i + 251, 0.0, 1.0), (i + 1) % 2)
    }
    // Station 010030: Jan+Feb (59 days); `max` all-sentinel in January
    // only → the per-(stn, Jan) median is null → proximity fallback.
    for (i <- 0 until 59) {
      val date = base.plusDays(i.toLong)
      val mx = if (date.getMonthValue == 1) 9999.9 else v(i + 301, 40.0, 70.0)
      rows += Row("010030", Date.valueOf(date), v(i + 311, 25.0, 55.0),
        v(i + 321, 2.0, 9.0), v(i + 331, 3.0, 11.0), v(i + 341, 6.0, 18.0),
        mx, v(i + 351, 12.0, 38.0), v(i + 361, 0.0, 1.2), i % 3 match { case 0 => 1; case _ => 0 })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 4), schema)
  }

  /** Tiny single-station frame for exact-value window tests:
    * one row per value, consecutive dates. */
  def tiny(spark: SparkSession, values: Seq[java.lang.Double]): DataFrame = {
    val base = LocalDate.of(2023, 6, 1)
    val rows = values.zipWithIndex.map { case (x, i) =>
      Row("000001", d(base, i), x)
    }
    val sch = StructType(Seq(
      StructField("stn", StringType, nullable = false),
      StructField("date", DateType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), sch)
  }
}
