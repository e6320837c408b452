package graft.text

import graft.SparkSpec

/** Paragraph-grain near-dedup (Gopher §A1.2): boilerplate paragraphs
  * shared across otherwise-distinct documents flag at the paragraph
  * grain; same-doc repeats and clean docs do not. */
class ParagraphDedupSpec extends SparkSpec {

  import spark.implicits._

  private val boiler =
    (1 to 20).map(i => s"license$i").mkString(" ")

  test("cross-doc boilerplate flags; same-doc repeats and clean docs do not") {
    val docs = Seq(
      // two distinct docs sharing the boilerplate footer
      (1L, (1 to 30).map(i => s"alpha$i").mkString(" ") + "\n" + boiler),
      (2L, (1 to 30).map(i => s"beta$i").mkString(" ") + "\n" + boiler),
      // a doc repeating its OWN paragraph twice — same-doc, not flagged
      (3L, (1 to 25).map(i => s"gamma$i").mkString(" ") + "\n" +
        (1 to 25).map(i => s"gamma$i").mkString(" ")),
      // clean doc
      (4L, (1 to 30).map(i => s"delta$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.paragraphDupStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paragraphs"), r.getAs[Long]("n_dup_paragraphs"),
          r.getAs[Double]("dup_fraction")))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("near-dup (not just exact) paragraphs flag: one-token edit survives the J >= 0.7 gate") {
    val edited = boiler.replace("license7", "licenseX")
    val docs = Seq(
      (1L, "intro one two three\n" + boiler),
      (2L, "other four five six\n" + edited)).toDF("doc_id", "text")
    val out = Dedup.paragraphDupStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_paragraphs"))
      .toMap
    assert(out(1L) == 1L && out(2L) == 1L)
  }

  test("harness fixture gate: recall floor and planted completeness hold at sf0.001") {
    val bounds = graft.queries.DedupQueries
      .qDedupParagraphsBounds(spark, sf001).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Boolean]("within_bounds"))
      .toMap
    assert(bounds.size == 3 && bounds.values.forall(identity), bounds.toString)
  }
}
