package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: splits q_dedup_clusters wall time into pair-gen vs
  * CC, so convergence-check changes are measured against the part they
  * touch (the pair graph dominates and drowns the signal otherwise). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = graft.text.Dedup.ngramJaccardPairs(
        graft.queries.DedupQueries.corpusNear(spark, sfDir), k = 3, minJaccard = 0.8)
        .localCheckpoint(true)
      val t1 = System.nanoTime()
      val cc = graft.text.Dedup.connectedComponents(pairs)
      cc.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[ccprobe] run$i pairs=${pairs.count()} pairgen=${(t1 - t0) / 1e9}%.2fs cc=${(t2 - t1) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
