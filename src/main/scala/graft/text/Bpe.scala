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
  * over distinct words, never a second pass over the corpus.
  *
  * The merge loop is HYBRID. Natural-language vocabularies obey Heaps'
  * law — even a 100 TB corpus yields a distinct-word table of a few
  * million rows — so once the corpus-wide aggregate lands, the table
  * almost always fits the driver: if it is under `maxDriverWords`
  * (default 2M ≈ low hundreds of MB of symbol arrays) it is collected
  * ONCE and the merges run in memory with incremental pair-count
  * maintenance (only words containing the merged pair are touched per
  * round — the standard fast-BPE formulation), making a realistic
  * 32k-merge tokenizer minutes of driver CPU instead of 32k Spark
  * job round-trips. Above the budget, the distributed loop runs: each
  * round is an explode+agg over the vocab frame, pulls exactly ONE row
  * to the driver (the argmax pair — a scalar pull, same discipline as
  * the k-means centroid pulls) and rewrites the symbol arrays with a
  * codegen'd `aggregate` fold (the left-to-right non-overlapping merge
  * of the reference algorithm); per-round frames are
  * `localCheckpoint`ed to keep the plan flat. `BpeSpec` pins the two
  * paths to identical merge tables on the same corpus.
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

  /** Driver-side vocabulary budget for the in-memory merge path. ~2M
    * distinct words × ~100 B of symbol array is low hundreds of MB —
    * comfortably inside a production driver; Heaps' law keeps real
    * corpora under this at any corpus size that matters. */
  val DefaultMaxDriverWords: Long = 2L * 1000 * 1000

  private def sqlQuote(sym: String): String =
    sym.replace("\\", "\\\\").replace("'", "\\'")

  /** In-memory merge loop over the collected (freq, symbols) table —
    * the fast path of the hybrid. Semantics are bit-identical to the
    * distributed loop (overlap-counted pairs weighted by word freq,
    * ties by (count desc, left, right), left-to-right non-overlapping
    * replacement); pair counts are maintained incrementally, so each
    * round touches only the words that contain the merged pair (the
    * pair→words index keeps stale entries, re-checked on use, instead
    * of paying index maintenance on every decrement). */
  private[text] def mergesInMemory(vocab0: Array[(Long, Array[String])],
      numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val freqs = vocab0.map(_._1)
    val syms = vocab0.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def account(i: Int, sign: Long): Unit = {
      val s = syms(i); val f = freqs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = counts.getOrElse(p, 0L) + sign * f
        if (n == 0L) counts.remove(p) else counts(p) = n
        if (sign > 0) index.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(account(_, 1L))
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // argmax scan: count desc, then (left, right) lexicographic — a
      // pure reduction, deterministic regardless of map iteration order
      var bl: String = null; var br: String = null; var bc = 0L
      counts.foreach { case ((l, r), c) =>
        if (c > bc || (c == bc && bl != null &&
            (l < bl || (l == bl && r < br)))) { bl = l; br = r; bc = c }
      }
      if (bl == null) done = true
      else {
        out += Merge(rank, bl, br, bc)
        val merged = bl + br
        index.getOrElse((bl, br), mutable.BitSet.empty).foreach { i =>
          val s = syms(i)
          var has = false; var j = 0
          while (!has && j < s.length - 1) {
            if (s(j) == bl && s(j + 1) == br) has = true
            j += 1
          }
          if (has) {
            account(i, -1L)
            val nb = Array.newBuilder[String]
            var k = 0
            while (k < s.length) {
              if (k + 1 < s.length && s(k) == bl && s(k + 1) == br) {
                nb += merged; k += 2
              } else { nb += s(k); k += 1 }
            }
            syms(i) = nb.result()
            account(i, 1L)
          }
        }
        index.remove((bl, br))
        rank += 1
      }
    }
    out.result()
  }

  /** Learn `numMerges` merges from `docs(textCol)`. Stops early if the
    * vocabulary runs out of adjacent pairs. `maxDriverWords` gates the
    * in-memory fast path (0 forces the distributed loop — spec hook). */
  def learnMerges(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 10,
      maxDriverWords: Long = DefaultMaxDriverWords): Seq[Merge] = {
    // the ONLY corpus-wide pass: word frequencies
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // array_remove: Spark's split(…, "") emits a trailing "" element
    var vocab = words
      .select(col("freq"), array_remove(split(col("w"), ""), "").as("syms"))
      .localCheckpoint()
    if (vocab.count() <= maxDriverWords) {
      val collected = vocab.collect().map(r =>
        (r.getLong(0), r.getSeq[String](1).toArray))
      return mergesInMemory(collected, numMerges)
    }
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

  /** Greedy BPE ENCODE of one word: repeatedly merge the
    * lowest-ranked adjacent pair present (left-to-right,
    * non-overlapping within a round) until no ranked pair remains —
    * the canonical apply order (lowest rank first, not first-found
    * first), which reproduces the training loop's final symbol state
    * on the corpus the table was learned from (`BpeSpec`). */
  private[graft] def encodeWord(word: String,
      rank: collection.Map[(String, String), Int]): Array[String] = {
    var s: Array[String] = word.map(_.toString).toArray
    var done = s.length < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < s.length - 1) {
        val r = rank.getOrElse((s(j), s(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val nb = Array.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k + 1 < s.length &&
              rank.getOrElse((s(k), s(k + 1)), Int.MaxValue) == best) {
            nb += (s(k) + s(k + 1)); k += 2
          } else { nb += s(k); k += 1 }
        }
        s = nb.result()
        done = s.length < 2
      }
    }
    s
  }

  /** Encode the corpus VOCABULARY with the pieces kept — the
    * inversion-gate surface ([[encodeStats]] keeps only counts):
    * (word, pieces) over the distinct words. Same vocab-bounded
    * `mapPartitions` discipline — the imperative merge loop never
    * touches a document row, only the Heaps'-law-bounded word table,
    * with the merge ranks broadcast once. */
  def encodePiecesByWord(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bRank = spark.sparkContext.broadcast(rank)
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "").distinct().as[String]
      .mapPartitions { it =>
        val r = bRank.value
        it.map(w => (w, encodeWord(w, r).toSeq))
      }.toDF("w", "pieces")
  }

  /** Distributed encoding of a corpus with a learned merge table —
    * the apply side of [[learnMerges]], and the honest way to count
    * post-tokenization tokens for packing/budgeting. Same word-table
    * trick as training: the corpus reduces to DISTINCT words
    * (vocab-bounded, Heaps' law), each word is encoded ONCE, and
    * documents join their tokens back to the per-word piece counts.
    * The imperative merge loop runs via `mapPartitions` over the
    * VOCAB — bounded rows, never the corpus; a documented last-resort
    * (genuinely iterative per-row logic, the same exemption as the
    * multimodal codec) with the merge ranks broadcast once. The
    * corpus-side work is one explode+groupBy and one (vocab-sized,
    * AQE-broadcastable) join — no UDF ever touches a document row.
    * Returns (doc_id[, carry...], n_tokens, n_pieces, n_word_bytes)
    * per document; `carry` threads extra doc-grain columns (e.g.
    * `source`) through the explode into the groupBy key, so rollups
    * above the doc grain (fertility per source) need no second join
    * back to the corpus. */
  def encodeStats(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text", idCol: String = "doc_id",
      carry: Seq[String] = Nil): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bRank = spark.sparkContext.broadcast(rank)
    val toks = docs.select((Seq(idCol) ++ carry).map(col) :+
        explode(TextAnalysis.tokens(col(textCol))).as("w"): _*)
      .filter(col("w") =!= "")
    val pieces = toks.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val r = bRank.value
        it.map(w => (w, encodeWord(w, r).length))
      }.toDF("w", "n_pieces_w")
    toks.join(pieces, Seq("w"))
      .groupBy((Seq(idCol) ++ carry).map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_pieces_w")).as("n_pieces"),
        sum(octet_length(col("w")).cast("long")).as("n_word_bytes"))
  }
}
