package graft.bench

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps `.explain("formatted")` for a representative set of queries to
  * EXPLAINS.md — plan-shape evidence (pushdown, broadcast, partial agg,
  * TakeOrdered, window composition) reviewable without running Spark.
  *
  *   scripts/run.sh graft.bench.ExplainDump [outFile]
  */
object ExplainDump {

  val Showcase: Seq[String] = Seq(
    "q_scan_filter", "q1_agg", "q_join_median_fill",
    "q_join_revenue_by_nation", "q_topk", "q_window_rows_avg",
    "q_asof_join", "q_dedup_minhash", "q_sim_bruteforce_topk",
    "q_events_time_window", "q_sessionize", "q_dedup_ngram",
    "q_join_bucketed", "q_partitioned_scan",
    "q_range_join", "q_tfidf", "q_contamination", "q_retention",
    "q_ntile_approx", "q_contamination_hashed", "q_ml_indexed_features",
    "q_attribution", "q_resample_ffill", "q_cube",
    "q_pack_blocks", "q_domain_mix", "q_zorder", "q_interpolate",
    "q_dedup_incremental", "q_heavy_hitters", "q_contamination_bloom",
    "q_topk_grouped", "q_events_window_topk", "q_corpus_profile",
    "q_dedup_incremental_minhash", "q_sketch_overlap",
    "q_lm_score", "q_leakage_safe_split",
    "q_curation", "q_dedup_embedding")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/EXPLAINS.md")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# EXPLAINS — formatted physical plans (sf0.001, regenerate via ")
    sb.append("`scripts/run.sh graft.bench.ExplainDump`)\n")
    Showcase.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // inlined binary literals (e.g. the contamination bloom sketch)
      // would otherwise dump megabytes of hex into the doc
      val bounded = plan.linesIterator.map { l =>
        if (l.length > 400) l.take(400) + s" …[${l.length - 400} chars elided]"
        else l
      }.mkString("\n")
      sb.append(s"\n## $name\n\n```\n$bounded\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
