package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only probe: times BPE merge learning at a large merge count —
  * the hybrid's collect-when-small path must make 1000 merges a
  * seconds-scale operation at sf0.1 (the distributed per-merge loop
  * was ~0.2 s of driver round-trip per merge). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val numMerges = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val merges = graft.text.Bpe.learnMerges(docs, numMerges = numMerges)
    println(f"[bpeprobe] merges=${merges.length} wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
      s"last=${merges.takeRight(2).map(m => s"${m.left}+${m.right}@${m.pairCount}").mkString(",")}")
    spark.stop()
  }
}
