package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.Dedup

/** Deduplication operators over the harness `documents` table.
  *
  * The harness corpus has no duplicate texts, so each query builds a
  * derived corpus: the documents plus a perturbed copy of each (first
  * token dropped, id offset by 100000). That plants one known near-dup
  * (exact dup for the exact-dedup query, which copies verbatim) per
  * document — ground truth the tests and oracles can check.
  */
object DedupQueries {

  val IdOffset = 100000L

  /** documents ∪ verbatim copy (ids offset) — for exact dedup. */
  def corpusExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.union(docs.select((col("doc_id") + IdOffset).as("doc_id"), col("text")))
  }

  /** documents ∪ first-token-dropped copy (ids offset) — for near-dup. */
  def corpusNear(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + IdOffset).as("doc_id"),
      concat_ws(" ", slice(Dedup.tokens(col("text")), 2, 100000)).as("text"))
    docs.union(perturbed)
  }

  /** Exact dedup (hash-groupBy): every text occurs exactly twice, the
    * keeper is always the original id. Output re-keyed by keeper so the
    * oracle needs no hash function parity. */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(corpusExact(s, d))
      .select(col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))

  val qDedupExactSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $IdOffset, text FROM documents
       |)
       |SELECT min(doc_id) AS keeper, count(*) AS n_copies
       |FROM corpus
       |GROUP BY text
       |ORDER BY keeper""".stripMargin

  /** MinHash LSH near-dup pairs — rows-only check (LSH bucket layout is
    * not SQL-reproducible); tests assert planted-pair recall. */
  def qDedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minhashPairs(corpusNear(s, d))
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash near-dup pairs — rows-only check. */
  def qDedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(corpusNear(s, d), maxHamming = 7, numBands = 8)
      .orderBy(col("id_a"), col("id_b"))

  /** N-gram Jaccard near-dup pairs. The verify step (exact Jaccard on
    * distinct 3-shingle sets) IS SQL-expressible; the oracle replays
    * candidate generation + verification with DuckDB list functions. */
  def qDedupNgram(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(corpusNear(s, d), k = 3, minJaccard = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_ngram" -> (qDedupNgram _))

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> qDedupExactSql)
}
