package graft.bench

import org.apache.spark.sql.SparkSession
import graft.queries.SimilarityQueries

/** Dev-only recall/nProbe curve for the IVF index on the harness
  * embeddings at sf0.1. */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val exact = SimilarityQueries.qSimBruteForce(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val (_, centroids) = SimilarityQueries.ivfIndexFor(spark, d)
    val n = centroids.size
    println(s"nCells = $n")
    for (p <- Seq(n / 8, n / 4, n / 2, n * 5 / 8, n * 3 / 4, n * 7 / 8, n)) {
      val approx = SimilarityQueries.qSimIvfProbe(spark, d, p).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      println(f"nProbe=$p%3d (${p * 100.0 / n}%.0f%% of cells): recall@5 = $recall%.3f")
    }
    spark.stop()
  }
}
