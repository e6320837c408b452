package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only probe: measured PQ recall@5 vs brute force at a scale dir. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = graft.queries.SimilarityQueries.qSimBruteForce(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = graft.queries.SimilarityQueries.qSimPqTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = graft.queries.SimilarityQueries.qSimIvfPqTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    println(s"[pqprobe] dir=$d pq_recall@5=${(exact & approx).size.toDouble / exact.size} " +
      s"ivfpq_recall@5=${(exact & ivfpq).size.toDouble / exact.size}")
    spark.stop()
  }
}
