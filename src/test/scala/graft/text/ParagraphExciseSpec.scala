package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Paragraph excision (Gopher §A1.2's REMOVAL step at paragraph
  * grain): the first-seen owner of each cross-doc duplicated
  * paragraph keeps it, every other document loses it, accounting is
  * conservation-exact, and the banded tier reproduces the exact tier
  * on the clique geometry it exists for. */
class ParagraphExciseSpec extends SparkSpec {

  import spark.implicits._

  private val boiler = (1 to 20).map(i => s"license$i").mkString(" ")

  private def fixture = Seq(
    // three distinct docs sharing the boilerplate footer: doc 1 is the
    // first-seen owner (its footer uid is the clique minimum)
    (1L, (1 to 30).map(i => s"alpha$i").mkString(" ") + "\n" + boiler),
    (2L, (1 to 30).map(i => s"beta$i").mkString(" ") + "\n" + boiler),
    (3L, boiler + "\n" + (1 to 30).map(i => s"gamma$i").mkString(" ")),
    // clean doc and a doc with a blank line (dropped by the frame)
    (4L, (1 to 30).map(i => s"delta$i").mkString(" ")),
    (5L, (1 to 15).map(i => s"eps$i").mkString(" ") + "\n\n" +
      (1 to 15).map(i => s"zeta$i").mkString(" "))).toDF("doc_id", "text")

  private def collectOut(df: DataFrame) = df.collect().map { r =>
    r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_paragraphs"), r.getAs[Long]("n_paras_removed"),
        r.getAs[Long]("chars_removed"), r.getAs[String]("text_clean")))
  }.toMap

  test("first-seen owner keeps the boilerplate; later docs lose exactly it") {
    val out = collectOut(Dedup.paragraphExcise(fixture))
    // doc 1: footer at ordinal 1 -> uid 1025, the clique min among
    // {1025, 2049, 3072} -> doc 1 keeps both paragraphs verbatim
    assert(out(1L) == ((2L, 0L, 0L,
      (1 to 30).map(i => s"alpha$i").mkString(" ") + "\n" + boiler)))
    assert(out(2L) == ((2L, 1L, boiler.length.toLong,
      (1 to 30).map(i => s"beta$i").mkString(" "))))
    // doc 3's boilerplate is its FIRST paragraph — removal must not
    // disturb the surviving second paragraph or its order
    assert(out(3L) == ((2L, 1L, boiler.length.toLong,
      (1 to 30).map(i => s"gamma$i").mkString(" "))))
    assert(out(4L) == ((1L, 0L, 0L, (1 to 30).map(i => s"delta$i").mkString(" "))))
    // blank line dropped by the frame, both real paragraphs kept
    assert(out(5L) == ((2L, 0L, 0L,
      (1 to 15).map(i => s"eps$i").mkString(" ") + "\n" +
        (1 to 15).map(i => s"zeta$i").mkString(" "))))
  }

  test("conservation: kept + removed reconstruct the paragraph frame exactly") {
    val docs = graft.queries.DedupQueries.paraCorpus(spark, sf001)
      .localCheckpoint(true)
    val paras = Dedup.paragraphFrame(docs)
    val truth = paras
      .selectExpr("uid div 1024 as doc_id", "length(para) as chars")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.sum("chars").as("chars"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("chars")))).toMap
    val out = Dedup.paragraphExcise(docs).collect()
    assert(out.nonEmpty && out.exists(_.getAs[Long]("n_paras_removed") > 0L))
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (n, chars) = truth(d)
      val clean = r.getAs[String]("text_clean")
      val keptParas = if (clean.isEmpty) Seq.empty else clean.split("\n", -1).toSeq
      // paragraph-count conservation
      assert(keptParas.length + r.getAs[Long]("n_paras_removed") == n,
        s"doc $d paragraph count")
      // character conservation: kept paragraph chars + removed chars
      // == the frame's total paragraph chars (separators excluded)
      assert(keptParas.map(_.length.toLong).sum +
        r.getAs[Long]("chars_removed") == chars, s"doc $d chars")
      assert(r.getAs[Long]("n_paragraphs") == n, s"doc $d n_paragraphs")
    }
    // every frame doc appears in the output
    assert(out.length == truth.size)
  }

  test("banded tier reproduces the exact tier on the clique geometry") {
    // verbatim boilerplate cliques (J = 1): identical paragraphs have
    // identical signatures, so every band collides and the banded
    // swap-in is DETERMINISTICALLY equal to the exact tier here — the
    // sub-1 Jaccard tail is covered by q_dedup_paragraphs_bounds'
    // measured ≥ 0.95 recall floor, not by this equality
    val exact = Dedup.paragraphExcise(fixture)
    val banded = Dedup.paragraphExcise(fixture, banded = true)
    assert(exact.exceptAll(banded).count() == 0L &&
      banded.exceptAll(exact).count() == 0L)
  }
}
