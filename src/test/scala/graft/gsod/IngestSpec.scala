package graft.gsod

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** CSV ingest with the explicit schema (SURVEY.md §1.2 / §4.3.4 — the
  * reference's `inferSchema=True` would coerce zero-padded station ids
  * to ints and cost an extra full scan).
  */
class IngestSpec extends SparkSpec {

  test("readCsv: explicit schema preserves leading-zero stn, types, sentinels") {
    val dir = Files.createTempDirectory("graft-csv")
    val csv =
      """stn,wban,date,year,mo,da,temp,count_temp,dewp,count_dewp,slp,count_slp,stp,count_stp,visib,count_visib,wdsp,count_wdsp,mxpsd,gust,max,flag_max,min,flag_min,prcp,flag_prcp,sndp,fog,rain_drizzle,snow_ice_pellets,hail,thunder,tornado_funnel_cloud
        |010020,99999,2023-01-01,2023,1,1,31.5,24,25.1,24,1013.2,24,998.0,24,6.2,24,4.1,24,9.9,999.9,35.2,*,28.0,,0.02,A,999.9,0,0,0,0,0,0
        |010020,99999,2023-01-02,2023,1,2,9999.9,0,9999.9,0,9999.9,0,9999.9,0,999.9,0,999.9,0,999.9,999.9,9999.9,,9999.9,,99.99,,999.9,1,1,0,0,0,0
        |""".stripMargin.replaceAll("(?m)^\\s+", "")
    Files.writeString(dir.resolve("gsod.csv"), csv)

    val df = GsodPipeline.readCsv(spark, dir.toString)
    assert(df.schema("stn").dataType == StringType)
    assert(df.schema("date").dataType == DateType)
    assert(df.schema("temp").dataType == DoubleType)

    val rows = df.orderBy("date").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("stn") == "010020") // leading zero survives
    assert(rows(0).getAs[Double]("temp") == 31.5)

    // sentinel-nulling then missing counts: row 2 is all-sentinel
    val cleaned = Clean.sentinelToNull(df)
    val m = Clean.missingCountMap(cleaned, Seq("temp", "visib", "max", "prcp", "sndp"))
    assert(m == Map("temp" -> 1L, "visib" -> 1L, "max" -> 1L, "prcp" -> 1L, "sndp" -> 2L))
  }
}
