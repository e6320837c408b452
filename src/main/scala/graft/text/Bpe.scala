package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al., ACL'16 —
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * learn the first `numMerges` byte-pair merges from a corpus. The
  * missing piece between corpus curation and model training — the
  * tokenizer itself is fit on the curated data, and at 100 TB that fit
  * must be distributed.
  *
  * The classical scale trick: BPE statistics only depend on the WORD
  * FREQUENCY table, so after one corpus-wide (word → freq) aggregate
  * (the only full-corpus shuffle), every merge iteration runs on the
  * |vocab|-bounded frame — pair counting is an explode + partial agg
  * over distinct words, never a second pass over the corpus. Each
  * round pulls exactly ONE row to the driver (the argmax pair — a
  * scalar pull, same discipline as the k-means centroid pulls) and
  * rewrites the symbol arrays with a codegen'd `aggregate` fold (the
  * left-to-right non-overlapping merge of the reference algorithm).
  * Per-round frames are `localCheckpoint`ed to keep the plan flat.
  *
  * Ties on pair count break by (left, right) lexicographic order, so
  * the learned merge table is a pure function of the data —
  * deterministic across partitionings (`BpeSpec` pins it against an
  * in-memory reference implementation).
  *
  * Within-word only, no end-of-word marker: the downstream consumer
  * here is vocabulary induction, where the marker is a constant-factor
  * detail; the merge ORDER is what the spec checks.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  private def sqlQuote(sym: String): String =
    sym.replace("\\", "\\\\").replace("'", "\\'")

  /** Learn `numMerges` merges from `docs(textCol)`. Stops early if the
    * vocabulary runs out of adjacent pairs. */
  def learnMerges(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 10): Seq[Merge] = {
    // the ONLY corpus-wide pass: word frequencies
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // array_remove: Spark's split(…, "") emits a trailing "" element
    var vocab = words
      .select(col("freq"), array_remove(split(col("w"), ""), "").as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = vocab
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        val (ql, qr) = (sqlQuote(l), sqlQuote(r))
        val qm = sqlQuote(l + r)
        // left-to-right non-overlapping merge as a fold over the symbol
        // array (the reference algorithm's replacement order)
        // try_element_at: NULL (≠ left) on the empty accumulator instead
        // of an ANSI index error
        vocab = vocab.withColumn("syms", expr(
          s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
             |  CASE WHEN try_element_at(acc, -1) = '$ql' AND x = '$qr'
             |       THEN concat(slice(acc, 1, size(acc) - 1), array('$qm'))
             |       ELSE concat(acc, array(x)) END)""".stripMargin))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (rank-ordered). */
  def mergeTable(spark: SparkSession, docs: DataFrame,
      numMerges: Int = 10): DataFrame = {
    import spark.implicits._
    learnMerges(docs, numMerges = numMerges)
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.pairCount))
      .toDF("rank", "left", "right", "merged", "pair_count")
  }
}
