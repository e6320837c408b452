package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The composite curation pipeline — what a training-data engine
  * actually runs end-to-end over a raw corpus: quality gate → exact
  * dedup → near-dup cluster resolution, threading one DataFrame
  * through with per-stage accounting (the same operator architecture
  * as [[graft.gsod.Impute.applyAll]], applied to the corpus domain).
  *
  * Stage semantics:
  *  1. quality: keep documents whose composite quality score
  *     ([[TextAnalysis.withQualitySignals]]) reaches `minQuality`;
  *  2. exact: keep only each content group's min-id keeper
  *     ([[Dedup.exactDedup]] — sha-256 groupBy, a left-semi join back);
  *  3. near-dup: generate exact n-gram Jaccard pairs among the
  *     survivors ([[Dedup.ngramJaccardPairs]], recall 1.0), resolve
  *     clusters ([[Dedup.connectedComponents]]), and drop every
  *     clustered document that is not its cluster's keeper.
  *
  * Scale: each stage is the already-audited operator — narrow
  * expression filter; digest groupBy + semi join; prefix-filtered
  * pair join + label propagation. Nothing here adds a new shuffle
  * shape. Stages persist their survivor frames (each feeds the next
  * stage AND the accounting count); callers clear cache when done
  * (the Bench/Verify contract).
  */
object Curation {

  final case class Result(survivors: DataFrame, accounting: Seq[(String, Long)])

  /** `withAccounting = false` skips the four per-stage count actions
    * (the reference-style printed accounting) — callers that only
    * consume the survivor frame save a full materialization per
    * stage. */
  def curate(docs: DataFrame, minQuality: Double,
      k: Int = 3, minJaccard: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id",
      withAccounting: Boolean = true): Result = {
    val acc = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    def account(stage: String, df: DataFrame): Unit =
      if (withAccounting) acc += stage -> df.count()
    account("input", docs)

    val quality = TextAnalysis.withQualitySignals(docs, textCol)
      .filter(col("quality_score") >= minQuality)
      .select(col(idCol), col(textCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    account("quality", quality)

    val keepers = Dedup.exactDedup(quality, textCol, idCol)
      .select(col("keeper").as(idCol))
    val exact = quality.join(keepers, Seq(idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    account("exact-dedup", exact)

    val pairs = Dedup.ngramJaccardPairs(exact, k, minJaccard, textCol, idCol)
    val clusteredNonKeepers = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    val survivors = exact.join(clusteredNonKeepers, Seq(idCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    account("near-dedup", survivors)

    Result(survivors, acc.toList)
  }
}
