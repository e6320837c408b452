package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Dev-only comparison of shingle-construction strategies at sf0.1. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val corpus = graft.queries.DedupQueries.corpusNear(spark, "/root/testdata/sf0.1")
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      time(s"[$i] string shingles explode-count") {
        println(corpus.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 3))).as("tok"))
          .select(col("doc_id"), xxhash64(col("tok")).as("h")).count())
      }
      time(s"[$i] hash shingles explode-count") {
        println(Dedup.shingleHashFrame(corpus, 3, "text", "doc_id")
          .select(col("doc_id"), explode(col("sh")).as("h")).count())
      }
      time(s"[$i] hash shingles array-count (no explode)") {
        println(Dedup.shingleHashFrame(corpus, 3, "text", "doc_id").count())
      }
    }
    Dedup.shingleHashFrame(corpus, 3, "text", "doc_id")
      .select(col("doc_id"), explode(col("sh")).as("h")).explain("formatted")
    spark.stop()
  }
}
