package graft.gsod

import org.apache.spark.sql.types._

/** Explicit schema + sentinel catalogue for the GSOD daily-summary
  * table (SURVEY.md §1.2; column semantics from the reference's
  * BigQuery screenshots GSOD_feature_desc_{1,2,3}.png; sentinel map
  * materialized at ipynb c7:3-7).
  *
  * Explicit `StructType` instead of the reference's `inferSchema=True`
  * (ipynb c5:1): deterministic, preserves `stn` as a string (zero-padded
  * WMO ids would lose leading zeros as ints), and avoids the extra
  * full scan schema inference costs (SURVEY §4.3.4).
  */
object GsodSchema {

  val schema: StructType = StructType(Seq(
    StructField("stn", StringType, nullable = false),
    StructField("wban", IntegerType, nullable = true),
    StructField("date", DateType, nullable = false),
    StructField("year", IntegerType, nullable = true),
    StructField("mo", IntegerType, nullable = true),
    StructField("da", IntegerType, nullable = true),
    StructField("temp", DoubleType, nullable = true),
    StructField("count_temp", IntegerType, nullable = true),
    StructField("dewp", DoubleType, nullable = true),
    StructField("count_dewp", IntegerType, nullable = true),
    StructField("slp", DoubleType, nullable = true),
    StructField("count_slp", IntegerType, nullable = true),
    StructField("stp", DoubleType, nullable = true),
    StructField("count_stp", IntegerType, nullable = true),
    StructField("visib", DoubleType, nullable = true),
    StructField("count_visib", IntegerType, nullable = true),
    StructField("wdsp", DoubleType, nullable = true),
    StructField("count_wdsp", IntegerType, nullable = true),
    StructField("mxpsd", DoubleType, nullable = true),
    StructField("gust", DoubleType, nullable = true),
    StructField("max", DoubleType, nullable = true),
    StructField("flag_max", StringType, nullable = true),
    StructField("min", DoubleType, nullable = true),
    StructField("flag_min", StringType, nullable = true),
    StructField("prcp", DoubleType, nullable = true),
    StructField("flag_prcp", StringType, nullable = true),
    StructField("sndp", DoubleType, nullable = true),
    StructField("fog", IntegerType, nullable = true),
    StructField("rain_drizzle", IntegerType, nullable = true),
    StructField("snow_ice_pellets", IntegerType, nullable = true),
    StructField("hail", IntegerType, nullable = true),
    StructField("thunder", IntegerType, nullable = true),
    StructField("tornado_funnel_cloud", IntegerType, nullable = true)))

  /** Missing-value sentinels per numeric column (ipynb c7:3-7). */
  val sentinels: Map[String, Double] = Map(
    "temp" -> 9999.9, "dewp" -> 9999.9, "slp" -> 9999.9, "stp" -> 9999.9,
    "max" -> 9999.9, "min" -> 9999.9,
    "visib" -> 999.9, "wdsp" -> 999.9, "mxpsd" -> 999.9, "gust" -> 999.9,
    "sndp" -> 999.9,
    "prcp" -> 99.99)

  /** Columns dropped before imputation (ipynb c12:2-5: sparse or
    * redundant — count_* / flags / slp / stp / dewp are removed). */
  val columnsToDrop: Seq[String] = Seq(
    "count_temp", "count_dewp", "count_slp", "count_stp", "count_visib",
    "count_wdsp", "flag_max", "flag_min", "flag_prcp",
    "slp", "stp", "dewp", "gust", "sndp")

  /** Numeric feature columns for stats + ML assembly (ipynb c13:1-19). */
  val numericColumns: Seq[String] = Seq(
    "temp", "visib", "wdsp", "mxpsd", "max", "min", "prcp")

  /** Binary categorical indicator columns (ipynb c14:2-17). */
  val categoricalColumns: Seq[String] = Seq(
    "fog", "rain_drizzle", "snow_ice_pellets", "hail", "thunder",
    "tornado_funnel_cloud")
}
