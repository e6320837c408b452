package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextAnalysis

/** Text-analysis operators over the harness `documents` table, with
  * DuckDB oracles where the expression algebra is portable
  * (token counts, quality ratios); language-ID and fingerprints are
  * rows-only (hash functions / when-chains not worth mirroring in SQL —
  * semantics covered by TextAnalysisSpec on hand-built texts).
  */
object TextQueries {

  /** Token counting: whitespace tokens + BPE-ish subword units. */
  def qTextTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  val qTextTokensSql: String =
    """SELECT doc_id,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_ws_tokens,
      |  len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Quality signals + composite score per document. */
  def qTextQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withQualitySignals(Tables.documents(s, d))
      .select(col("doc_id"), col("n_chars").as("len_chars"), col("n_tokens"),
        col("avg_token_len"), col("alpha_ratio"), col("punct_ratio"),
        col("stopword_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))

  val qTextQualitySql: String = {
    val stop = TextAnalysis.langProfiles.flatMap(_._2).distinct
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  length(text) AS len_chars,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END AS n_tokens,
       |  CASE WHEN n_tokens > 0 THEN CAST(length(text) AS DOUBLE) / n_tokens ELSE 0.0 END AS avg_token_len,
       |  CASE WHEN length(text) > 0
       |       THEN CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS DOUBLE) / length(text)
       |       ELSE 0.0 END AS alpha_ratio,
       |  CASE WHEN length(text) > 0
       |       THEN CAST(length(regexp_replace(text, '[^\\p{P}\\p{S}]', '', 'g')) AS DOUBLE) / length(text)
       |       ELSE 0.0 END AS punct_ratio,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                  t -> list_contains($stop, t))) AS DOUBLE) / n_tokens
       |       ELSE 0.0 END AS stopword_ratio,
       |  least(1.0, greatest(0.0,
       |    0.25 * least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
       |    + 0.25 * alpha_ratio
       |    + 0.25 * (1.0 - punct_ratio)
       |    + 0.25 * least(stopword_ratio * 5.0, 1.0))) AS quality_score
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** Canonical normalization pass over the corpus — lowercased,
    * punctuation stripped, whitespace collapsed — with the token count
    * after cleaning. */
  def qTextNormalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.normalize(col("text")).as("text_norm"))
      .withColumn("n_norm_tokens", TextAnalysis.wsTokenCount(col("text_norm")))
      .orderBy(col("doc_id"))

  val qTextNormalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]+', ' ', 'g'),
      |       '\s+', ' ', 'g')) AS text_norm,
      |  CASE WHEN length(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]+', ' ', 'g'),
      |       '\s+', ' ', 'g'))) = 0 THEN 0
      |       ELSE len(string_split_regex(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]+', ' ', 'g'),
      |       '\s+', ' ', 'g')), '\s+')) END AS n_norm_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Language ID (rows-only; the harness corpus is English-vocab
    * throughout, so the distribution check lives in the spec). */
  def qTextLangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Order-sensitive rolling-hash fingerprint (rows-only). */
  def qTextFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokens" -> (qTextTokens _),
    "q_text_quality" -> (qTextQuality _),
    "q_text_normalize" -> (qTextNormalize _),
    "q_text_langid" -> (qTextLangId _),
    "q_text_fingerprint" -> (qTextFingerprint _))

  val oracles: Map[String, String] = Map(
    "q_text_tokens" -> qTextTokensSql,
    "q_text_quality" -> qTextQualitySql,
    "q_text_normalize" -> qTextNormalizeSql)
}
