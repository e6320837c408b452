package graft.bench

import org.apache.spark.sql.SparkSession
import graft.gsod.{Clean, Fixture, Impute}

/** Dev-only: print the exact per-stage imputation accounting on the
  * deterministic fixture (source for the PipelineSpec golden). */
object AccountingDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cleaned = Clean.sentinelToNull(Fixture.df(spark))
    val (_, acc) = Impute.applyAll(cleaned)
    Impute.referenceStrategies.map(_.column).foreach { c =>
      println(s"$c -> ${acc(c)}")
    }
    spark.stop()
  }
}
