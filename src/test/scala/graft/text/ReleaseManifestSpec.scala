package graft.text

import graft.SparkSpec
import graft.queries.{DedupQueries, ExtraQueries, QualityQueries, ReleaseQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The release manifest's accounting contract: stages chain (each
  * row's docs_in is the previous row's docs_out), every count equals
  * the stage operator run SEPARATELY on the previous stage's output,
  * and the pack row is pure block arithmetic. */
class ReleaseManifestSpec extends SparkSpec {

  private lazy val manifest = ReleaseQueries.qCorpusRelease(spark, sf001)
    .collect()
    .map(r => r.getAs[String]("stage") ->
      ((r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"),
        r.getAs[Long]("tokens_out"))))

  test("stages chain: docs_in(i+1) == docs_out(i), counts non-increasing through mix") {
    val byId = manifest.map(_._2).toSeq
    byId.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      if (i < 8) // pack's docs_out is blocks, not docs — excluded
        assert(b._1 == a._2, s"chain break after stage $i: ${manifest.toSeq}")
    }
    // doc counts never increase (no stage invents documents)
    byId.take(9).sliding(2).foreach { case Seq(a, b) => assert(b._2 <= a._2) }
    assert(byId.head._1 == 500L) // sf0.001 corpus size — fixture drift guard
  }

  test("each stage's count equals the operator run separately") {
    val m = manifest.toMap
    val toks = TextAnalysis.wsTokenCount(col("text"))
    def tokensOf(df: DataFrame): Long =
      df.agg(coalesce(sum(toks), lit(0L))).head().getLong(0)
    val s0 = DedupQueries.paraCorpus(spark, sf001).localCheckpoint(true)
    assert(m("input") == ((s0.count(), s0.count(), tokensOf(s0))))

    val s1 = s0.join(Blocklist
        .screen(s0, "doc_id", "text", QualityQueries.BlockPhrases)
        .filter(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "left_semi").localCheckpoint(true)
    assert(m("blocklist") == ((s0.count(), s1.count(), tokensOf(s1))))

    val s2 = TextAnalysis.withQualitySignals(s1)
      .filter(col("quality_score") >= DedupQueries.CurationMinQuality)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    assert(m("quality") == ((s1.count(), s2.count(), tokensOf(s2))))

    val s3 = Dedup.paragraphExcise(s2.select(col("doc_id"), col("text")))
      .filter(col("text_clean") =!= "")
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(s2.select(col("doc_id"), col("source")), Seq("doc_id"))
      .localCheckpoint(true)
    assert(m("paragraph_excise") == ((s2.count(), s3.count(), tokensOf(s3))))

    val s4 = s3.join(Dedup.exactDedup(s3).select(col("keeper").as("doc_id")),
      Seq("doc_id"), "left_semi").localCheckpoint(true)
    assert(m("exact_dedup") == ((s3.count(), s4.count(), tokensOf(s4))))

    val s5 = s4.join(
      Dedup.connectedComponents(Dedup.ngramJaccardPairs(s4))
        .filter(col("doc_id") =!= col("component")).select(col("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint(true)
    assert(m("near_dedup") == ((s4.count(), s5.count(), tokensOf(s5))))

    val probe = graft.Tables.documents(spark, sf001)
      .filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val s6 = s5.join(probe.select(col("text")), Seq("text"), "left_anti")
      .localCheckpoint(true)
    assert(m("decontam_exact") == ((s5.count(), s6.count(), tokensOf(s6))))

    val s7 = s6.join(Dedup.containmentPairs(probe, s6)
        .select(col("train_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti").localCheckpoint(true)
    assert(m("decontam_containment") == ((s6.count(), s7.count(), tokensOf(s7))))

    val s8 = s7.join(graft.ops.DomainMix.waterFillSelect(
        s7.select(col("doc_id"), col("source"), toks.as("n_tokens")),
        "source", "doc_id", "n_tokens",
        ExtraQueries.WaterFillWeights.toMap, 3L, 5L).select(col("doc_id")),
      Seq("doc_id"), "left_semi").localCheckpoint(true)
    assert(m("mix") == ((s7.count(), s8.count(), tokensOf(s8))))

    val packed = tokensOf(s8)
    assert(m("pack") == ((s8.count(), (packed + 511L) / 512L, packed)))
  }

  test("the manifest does real work: every dropping stage drops on the fixture") {
    val m = manifest.toMap
    assert(m("blocklist")._2 < m("blocklist")._1)
    assert(m("quality")._2 < m("quality")._1)
    assert(m("paragraph_excise")._2 < m("paragraph_excise")._1)
    // tokens drop MORE than docs at the paragraph stage: rewrites, not
    // just doc drops
    assert(m("paragraph_excise")._3 < m("quality")._3)
    assert(m("decontam_exact")._2 < m("decontam_exact")._1)
    assert(m("mix")._2 < m("mix")._1)
    assert(m("pack")._2 > 0L)
  }
}
