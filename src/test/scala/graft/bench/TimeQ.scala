package graft.bench
import org.apache.spark.sql.SparkSession
/** Dev timing harness: `scripts/run.sh graft.bench.TimeQ <query>...`
  * runs each named query 3x against sf0.1 with the noop sink. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // match Bench's contract: no persisted frames survive between runs
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
