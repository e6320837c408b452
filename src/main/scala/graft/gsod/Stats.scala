package graft.gsod

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-profile statistics (SURVEY.md §2.5 A1–A7: the reference's
  * per-column EDA loop, ipynb c13:21-34).
  *
  * The reference runs 3 jobs per column (agg, approxQuantile, mode
  * groupBy) ×14 columns. Here the mean/stddev/median/mode/distinct for
  * ALL columns are computed in ONE aggregate job — Spark 4 has exact
  * `median` and `mode` as built-in aggregates, so the whole profile is
  * a single pass with map-side partial aggregation. `approxQuantile`
  * (Greenwald–Khanna) is kept as the scale path for quantiles beyond
  * the median.
  */
object Stats {

  /** One row per profiled column: mean / stddev / median / mode /
    * distinct count. Single job regardless of column count. */
  def describe(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        avg(col(c)).as(s"${c}__mean"),
        stddev(col(c)).as(s"${c}__stddev"),
        median(col(c)).as(s"${c}__median"),
        mode(col(c)).cast(DoubleType).as(s"${c}__mode"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    val out = columns.map { c =>
      Row(c,
        row.getAs[Any](s"${c}__mean") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Any](s"${c}__stddev") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Any](s"${c}__median") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Any](s"${c}__mode") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Long](s"${c}__distinct"))
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("mean", DoubleType, nullable = true),
      StructField("stddev", DoubleType, nullable = true),
      StructField("median", DoubleType, nullable = true),
      StructField("mode", DoubleType, nullable = true),
      StructField("n_distinct", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toIndexedSeq, 1), schema)
  }

  /** Approximate quantiles via Greenwald–Khanna (ipynb c13:30,
    * c16:96) — the 100 TB path for quantile queries: mergeable sketch,
    * no sort. */
  def approxQuantiles(df: DataFrame, column: String,
      probabilities: Array[Double], relErr: Double = 0.001): Array[Double] =
    df.stat.approxQuantile(column, probabilities, relErr)

  /** Multi-column variant — ONE pass builds one GK sketch per column
    * (the reference's per-column `approxQuantile` loop, ipynb c13:30,
    * collapsed to a single job, same move as [[describe]]). */
  def approxQuantiles(df: DataFrame, columns: Array[String],
      probabilities: Array[Double], relErr: Double): Array[Array[Double]] =
    df.stat.approxQuantile(columns, probabilities, relErr)

  /** Sketch-based profile — the 100 TB variant of [[describe]]: HLL
    * distinct + Greenwald–Khanna median, still one aggregate job, all
    * partial states mergeable (no exact-median per-group value
    * buffering). */
  def describeApprox(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        avg(col(c)).as(s"${c}__mean"),
        stddev(col(c)).as(s"${c}__stddev"),
        percentile_approx(col(c), lit(0.5), lit(10000)).cast(DoubleType).as(s"${c}__median"),
        approx_count_distinct(col(c), 0.02).as(s"${c}__distinct"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    val out = columns.map { c =>
      Row(c,
        row.getAs[Any](s"${c}__mean") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Any](s"${c}__stddev") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Any](s"${c}__median") match { case null => null; case v: Number => v.doubleValue() },
        row.getAs[Long](s"${c}__distinct"))
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("mean", DoubleType, nullable = true),
      StructField("stddev", DoubleType, nullable = true),
      StructField("approx_median", DoubleType, nullable = true),
      StructField("approx_distinct", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toIndexedSeq, 1), schema)
  }
}
