package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Dev-only stage profile of embedding near-dup (SRP) at sf0.1. */
object SrpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val d = "/root/testdata/sf0.1"
      val base = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val doubled = base.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * 2.0f).as("embedding"))
      val corpus = base.union(doubled)
      time(s"[$i] corpus count")(println(corpus.count()))
      val out = Similarity.embeddingNearDupPairs(corpus, minCosine = 0.95)
      time(s"[$i] pairs")(println(out.count()))
    }
    spark.stop()
  }
}
