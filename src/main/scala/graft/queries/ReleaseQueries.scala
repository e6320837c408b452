package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end corpus-release manifest (r18 verdict directive 3):
  * every curation stage exists and is individually gated; this member
  * makes the COMPOSITION driver-visible — one query running the full
  * shipped recipe over the boilerplate-fixture corpus and emitting the
  * per-stage (docs_in, docs_out, tokens_out) accounting a data lead
  * reads off a release. HASH-GREEN end to end: the DuckDB twin chains
  * the stages' existing oracle spellings (blocklist keep predicate,
  * the quality-gate CTE, paragraph excision at J ≥ 0.7, exact +
  * n-gram dedup, text-equality + containment decontamination, the
  * water-fill allocation and greedy-prefix selection, 512-token block
  * arithmetic) into one WITH chain, so a drift in ANY stage's wiring
  * or accounting flips the hash.
  *
  * The eval probe for the decontamination stages is the 1%-slice
  * doc_id ≡ 0 (mod 97) of the ORIGINAL documents — a frozen benchmark
  * snapshot whose members are themselves in the corpus: docs that
  * revert to probe-verbatim text after the paragraph stage drop at the
  * exact tier (2–19 docs across SFs), and docs still EMBEDDING a probe
  * doc drop at the containment tier (11 docs at sf0.1; 0 at the small
  * SFs, where every embedding host was already screened upstream —
  * the stage runs either way and the twin replays it).
  *
  * Two measured fixture properties worth knowing when reading the
  * manifest: on this corpus documents are single-line, so a whole-doc
  * near-dup IS a cross-doc duplicate paragraph and the paragraph stage
  * (J ≥ 0.7) subsumes the doc-grain stages (exact_dedup / near_dedup
  * at J ≥ 0.8 read 0 drops here — on multi-paragraph corpora they are
  * the stages that bite); and the pack row's docs_out is the BLOCK
  * count ⌈tokens/512⌉, the unit a release actually ships. */
object ReleaseQueries {

  def qCorpusRelease(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.documents(s, d)
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    graft.text.Curation.releaseManifest(
        DedupQueries.paraCorpus(s, d),
        QualityQueries.BlockPhrases,
        DedupQueries.CurationMinQuality,
        probe,
        ExtraQueries.WaterFillWeights.toMap)
      .orderBy(col("stage_id"))
  }

  private def sqlQuote(x: String): String = x.replace("'", "''")

  /** `(SELECT count(*) FROM rel)` — stage doc count. */
  private def cnt(rel: String): String = s"(SELECT count(*) FROM $rel)"

  /** Whitespace-token sum of a stage relation — the house
    * wsTokenCount convention, identical to qPackBlocksSql's. */
  private def tok(rel: String): String =
    s"(SELECT CAST(coalesce(sum(CASE WHEN length(trim(text)) = 0 THEN 0 " +
      s"ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END), 0) " +
      s"AS BIGINT) FROM $rel)"

  val qCorpusReleaseSql: String = {
    val phr = QualityQueries.BlockPhrases
      .map(p => s"'${sqlQuote(p)}'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE donated AS (
       |  SELECT doc_id // 4 AS g,
       |    array_to_string(list_slice(string_split(text, ' '), 1, 48), ' ') AS boiler
       |  FROM documents WHERE doc_id % 4 = 0
       |), s0 AS MATERIALIZED (
       |  SELECT d.doc_id, d.source,
       |    CASE WHEN b.boiler IS NOT NULL AND length(b.boiler) > 0
       |      THEN d.text || chr(10) || b.boiler ELSE d.text END AS text
       |  FROM documents d LEFT JOIN donated b ON d.doc_id // 4 = b.g
       |), s1 AS MATERIALIZED (
       |  SELECT * FROM s0
       |  WHERE len(list_filter($phr, p -> contains(text, p))) = 0
       |), ${DedupQueries.qualityGateCte("s1", "s2", "doc_id, source, text")},
       |plist AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, chr(10)) AS ps FROM s2
       |), paras AS MATERIALIZED (
       |  SELECT doc_id * 1024 + (i - 1) AS doc_id, ps[i] AS text
       |  FROM plist, unnest(range(1, len(ps) + 1)) t(i)
       |  WHERE length(trim(ps[i])) > 0
       |), ${DedupQueries.ngramPairCtes("paras", "0.7", "p_")},
       |p_removed AS (
       |  SELECT DISTINCT id_b AS uid FROM p_pairs WHERE id_a // 1024 <> id_b // 1024
       |), p_tagged AS MATERIALIZED (
       |  SELECT p.doc_id AS uid, p.text AS para, r.uid IS NOT NULL AS rm
       |  FROM paras p LEFT JOIN p_removed r ON p.doc_id = r.uid
       |), p_docs AS MATERIALIZED (
       |  SELECT uid // 1024 AS doc_id,
       |    string_agg(CASE WHEN NOT rm THEN para END, chr(10) ORDER BY uid) AS text
       |  FROM p_tagged GROUP BY 1
       |), s3 AS MATERIALIZED (
       |  SELECT d.doc_id, q.source, d.text
       |  FROM p_docs d JOIN s2 q ON d.doc_id = q.doc_id
       |  WHERE d.text IS NOT NULL AND d.text <> ''
       |), e_keep AS (
       |  SELECT min(doc_id) AS doc_id FROM s3 GROUP BY text
       |), s4 AS MATERIALIZED (
       |  SELECT s.* FROM s3 s JOIN e_keep k ON s.doc_id = k.doc_id
       |), ${DedupQueries.ngramPairCtes("s4", "0.8", "n_")},
       |${DedupQueries.ccCtesOver("n_pairs", "n_")},
       |n_nonkeep AS (
       |  SELECT src AS doc_id FROM n_reach GROUP BY src HAVING min(lbl) <> src
       |), s5 AS MATERIALIZED (
       |  SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM n_nonkeep)
       |), probe AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
       |), s6 AS MATERIALIZED (
       |  SELECT * FROM s5 WHERE text NOT IN (SELECT text FROM probe)
       |), c_ev AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM probe
       |), c_evsh AS (
       |  SELECT DISTINCT doc_id AS eval_id, array_to_string(toks[i:i+2], ' ') AS sh
       |  FROM c_ev, unnest(range(1, greatest(len(toks)-1, 1))) t(i)
       |), c_tr AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM s6
       |), c_trsh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id AS train_id, array_to_string(toks[i:i+2], ' ') AS sh
       |  FROM c_tr, unnest(range(1, greatest(len(toks)-1, 1))) t(i)
       |), c_sizes AS (
       |  SELECT eval_id, count(*) AS n_eval_shingles FROM c_evsh GROUP BY eval_id
       |), c_flagged AS (
       |  SELECT DISTINCT train_id FROM (
       |    SELECT eval_id, train_id, count(*) AS n_shared
       |    FROM c_evsh JOIN c_trsh USING (sh) GROUP BY eval_id, train_id) sh0
       |  JOIN c_sizes USING (eval_id)
       |  WHERE n_shared * 5 >= n_eval_shingles * 4
       |), s7 AS MATERIALIZED (
       |  SELECT * FROM s6 WHERE doc_id NOT IN (SELECT train_id FROM c_flagged)
       |), ${ExtraQueries.waterfillAllocCtesFor(1, 3, 5, "s7")},
       |sel_ranked AS MATERIALIZED (
       |  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM toks
       |), s8 AS MATERIALIZED (
       |  SELECT s.* FROM s7 s
       |  JOIN sel_ranked r ON s.doc_id = r.doc_id
       |  JOIN alloc a ON r.source = a.source
       |  WHERE r.cum_tokens <= a.allocated
       |)
       |SELECT * FROM (VALUES
       |  (0, 'input', ${cnt("s0")}, ${cnt("s0")}, ${tok("s0")}),
       |  (1, 'blocklist', ${cnt("s0")}, ${cnt("s1")}, ${tok("s1")}),
       |  (2, 'quality', ${cnt("s1")}, ${cnt("s2")}, ${tok("s2")}),
       |  (3, 'paragraph_excise', ${cnt("s2")}, ${cnt("s3")}, ${tok("s3")}),
       |  (4, 'exact_dedup', ${cnt("s3")}, ${cnt("s4")}, ${tok("s4")}),
       |  (5, 'near_dedup', ${cnt("s4")}, ${cnt("s5")}, ${tok("s5")}),
       |  (6, 'decontam_exact', ${cnt("s5")}, ${cnt("s6")}, ${tok("s6")}),
       |  (7, 'decontam_containment', ${cnt("s6")}, ${cnt("s7")}, ${tok("s7")}),
       |  (8, 'mix', ${cnt("s7")}, ${cnt("s8")}, ${tok("s8")}),
       |  (9, 'pack', ${cnt("s8")}, (${tok("s8")} + 511) // 512, ${tok("s8")})
       |) t(stage_id, stage, docs_in, docs_out, tokens_out)
       |ORDER BY stage_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_release" -> (qCorpusRelease _))

  val oracles: Map[String, String] = Map(
    "q_corpus_release" -> qCorpusReleaseSql)
}
