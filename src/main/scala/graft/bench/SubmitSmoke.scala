package graft.bench

import org.apache.spark.sql.SparkSession

/** Deployment smoke test for the `spark-submit` path: run with
  *
  *   spark-submit --master local[4] \
  *     --conf spark.sql.extensions=graft.plans.GraftExtensions \
  *     --class graft.bench.SubmitSmoke <graft jar>
  *
  * and the session must expose `dot_product` from SQL with NO
  * programmatic registration — proving the
  * [[graft.plans.GraftExtensions]] config entry point works exactly as
  * a cluster deployment would use it. Prints one JSON line on success,
  * exits nonzero on failure.
  */
object SubmitSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    val d = spark
      .sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    require(d == 11.0, s"dot_product via spark.sql.extensions returned $d")
    println(s"""{"submit_smoke":"ok","dot_product":$d}""")
    spark.stop()
  }
}
