package graft.bench

import org.apache.spark.sql.SparkSession
import graft.text.Dedup

/** Dev-only: where does q_dedup_clusters spend its time? */
object CcProfile {
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
      val corpus = graft.queries.DedupQueries.corpusNear(spark, "/root/testdata/sf0.1")
      val pairs = Dedup.ngramJaccardPairs(corpus).persist()
      time(s"[$i] pairs materialize")(println(pairs.count()))
      val cc = Dedup.connectedComponents(pairs)
      time(s"[$i] connected components")(println(cc.count()))
      // inline loop with per-iteration timing
      import org.apache.spark.sql.functions._
      val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))).persist()
      var labels = sym.select(col("src").as("doc_id")).distinct()
        .withColumn("component", col("doc_id")).persist()
      time(s"[$i] init")(labels.count())
      var changed = 1L; var it = 0
      while (changed > 0 && it < 20) {
        val nbrMin = sym
          .join(labels.select(col("doc_id").as("dst"), col("component").as("dst_comp")), Seq("dst"))
          .groupBy(col("src").as("doc_id")).agg(min(col("dst_comp")).as("nbr_comp"))
        val next = labels.join(nbrMin, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            least(col("component"), coalesce(col("nbr_comp"), col("component"))).as("component"),
            col("component").as("prev")).persist()
        changed = time(s"[$i] iter $it")(next.filter(col("component") =!= col("prev")).count())
        println(s"  changed = $changed")
        labels.unpersist(false)
        labels = next.select(col("doc_id"), col("component"))
        it += 1
      }
    }
    spark.stop()
  }
}
