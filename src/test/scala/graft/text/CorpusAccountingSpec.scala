package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.TextQueries

/** Cross-query invariants for the corpus accounting rows
  * (q_length_truncation, q_tokenizer_ablation, q_pack_efficiency) —
  * the algebra the hash oracle can't see: conservation laws and
  * consistency across independently-computed queries. */
class CorpusAccountingSpec extends SparkSpec {

  test("truncation: kept + dropped conserves totals; truncated count matches the cap") {
    val rows = TextQueries.qLengthTruncation(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, trunc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_truncated"))
      val (tot, kept, drop) = (r.getAs[Long]("tokens_total"),
        r.getAs[Long]("tokens_kept"), r.getAs[Long]("tokens_dropped"))
      assert(kept + drop == tot, s"conservation broken: $r")
      assert(kept <= 64L * docs, s"kept exceeds cap budget: $r")
      assert(trunc <= docs && (drop > 0) == (trunc > 0), s"truncated/dropped disagree: $r")
    }
    // the cap must actually bite somewhere (64 < max doc length 99)
    assert(rows.exists(_.getAs[Long]("tokens_dropped") > 0))
  }

  test("ablation: fewer merges never yield fewer pieces; full tier equals the fertility row") {
    val abl = TextQueries.qTokenizerAblation(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("pieces_full"),
          r.getAs[Long]("pieces_ablated")))).toMap
    abl.values.foreach { case (w, full, ab) =>
      assert(full >= w, "every word is at least one piece")
      assert(ab >= full, "a prefix vocabulary can only inflate the encoding")
    }
    assert(abl.values.exists { case (_, full, ab) => ab > full },
      "the dropped merges must bite somewhere")
    // cross-query consistency: the full-table piece counts are the same
    // numbers q_tokenizer_fertility_bpe reports (independent plans)
    val fert = TextQueries.qTokenizerFertilityBpe(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces")))).toMap
    assert(abl.view.mapValues(v => (v._1, v._2)).toMap == fert)
  }

  test("shard snake: all 8 shards live, deviations cancel, imbalance below one max document") {
    val shards = graft.queries.ExtraQueries.qShardSnake(spark, sf001).collect()
    assert(shards.map(_.getAs[Long]("shard")).toSeq == (0L to 7L))
    val devs = shards.map(_.getAs[Long]("dev_x8"))
    assert(devs.sum == 0L, "x8 deviations must cancel exactly")
    import spark.implicits._
    val maxDoc = graft.Tables.documents(spark, sf001)
      .select(TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))
      .agg(max(col("n"))).as[Long].head()
    // snake dealing keeps every shard within one document of ideal
    assert(devs.map(math.abs).max <= 8L * maxDoc,
      s"imbalance ${devs.map(math.abs).max / 8.0} exceeds max doc $maxDoc")
  }

  test("pack efficiency: occupancy conserves the token stream and only the tail block is partial") {
    val blocks = TextQueries.qPackEfficiency(spark, sf001).collect()
    val ids = blocks.map(_.getAs[Long]("block_id")).toSeq
    assert(ids == (0L until ids.length).toSeq, "block ids contiguous from 0")
    import spark.implicits._
    val total = graft.Tables.documents(spark, sf001)
      .select(TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))
      .agg(sum(col("n"))).as[Long].head()
    assert(blocks.map(_.getAs[Long]("tokens_filled")).sum == total)
    blocks.dropRight(1).foreach { b =>
      assert(b.getAs[Long]("tokens_filled") == 512L && b.getAs[Boolean]("is_full"), s"$b")
    }
    val nDocs = graft.Tables.documents(spark, sf001)
      .filter(length(trim(col("text"))) > 0).count()
    assert(blocks.map(_.getAs[Long]("n_starts")).sum == nDocs,
      "every non-empty doc starts in exactly one block")
  }
}
