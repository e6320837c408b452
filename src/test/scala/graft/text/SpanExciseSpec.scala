package graft.text

import graft.SparkSpec

/** Planted-fixture properties for [[Dedup.spanExcise]] — the ExactSubstr
  * rewrite. The q_span_excise hash row certifies engine parity on the
  * real corpus; this spec pins the SEMANTIC claims on a handcrafted
  * fixture where the expected rewrite is known by eye. */
class SpanExciseSpec extends SparkSpec {

  import spark.implicits._

  private val span8 = (1 to 8).map(i => s"w$i").mkString(" ")

  private def excise(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] =
    Dedup.spanExcise(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

  test("planted duplicated span is excised everywhere but its provenance doc") {
    val out = excise(Seq(
      (1L, s"$span8 tail one"),          // first owner: keeps the span
      (2L, s"pre $span8 post stuff"),    // non-first: span excised
      (3L, s"$span8")))                  // non-first: whole doc is the span
    assert(out(1L) == ((10L, 0L, 10L, s"$span8 tail one")),
      s"provenance doc must keep its text verbatim: ${out(1L)}")
    assert(out(2L) == ((11L, 1L, 3L, "pre post stuff")), s"got ${out(2L)}")
    assert(out(3L) == ((8L, 1L, 0L, "")), s"got ${out(3L)}")
  }

  test("non-duplicated text passes through byte-identical in token space") {
    val out = excise(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta iota kappa lambda mu nu")))
    assert(out(1L) == ((4L, 0L, 4L, "alpha beta gamma delta")))
    assert(out(2L)._4 == "epsilon zeta eta theta iota kappa lambda mu nu")
    assert(out.values.forall(_._2 == 0L))
  }

  test("greedy leftmost non-overlapping selection + exact token accounting") {
    // doc 2 contains the duplicated span at overlapping starts 1 and 5
    // (w1..w8 w1..w8 shifted): removable starts {1,2,...}; greedy takes
    // 1, skips everything below 9, takes 9 — two disjoint excisions.
    val doubled = s"$span8 $span8"
    val out = excise(Seq(
      (1L, s"$span8 distinct tail for the first owner"),
      (2L, s"$doubled trailing bits")))
    val (n, ex, nc, txt) = out(2L)
    assert(n == 18L && ex == 2L && nc == 2L, s"got ${out(2L)}")
    assert(txt == "trailing bits")
    // accounting identity holds on every row (k = 8)
    out.values.foreach { case (nt, nx, ncl, _) =>
      assert(ncl == nt - 8 * nx, s"accounting broke: ($nt, $nx, $ncl)")
    }
  }

  test("intra-doc repeats alone are not excised (minDocs is cross-document)") {
    val solo = "solo solo solo solo solo solo solo solo solo solo"
    val out = excise(Seq(
      (1L, solo),
      (2L, "entirely different words here to keep the corpus honest")))
    assert(out(1L) == ((10L, 0L, 10L, solo)),
      s"self-repeats in one doc must survive: ${out(1L)}")
  }

  test("excision accounting is exact on the real sf0.001 corpus") {
    val rows = graft.queries.DedupQueries.qSpanExcise(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(2) > 0), "expected natural excisions")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - 8 * r.getLong(2),
        s"accounting broke for doc ${r.getLong(0)}")
    }
  }
}
