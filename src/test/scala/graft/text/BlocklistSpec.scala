package graft.text

import graft.SparkSpec
import graft.queries.QualityQueries

class BlocklistSpec extends SparkSpec {

  import spark.implicits._

  private val phrases = Seq("aa", "table table", "hash join", "zz top")

  private def screenMap(rows: Seq[(Long, String)], ac: Boolean) = {
    val df = rows.toDF("doc_id", "text")
    val out =
      if (ac) Blocklist.screenAc(df, "doc_id", "text", phrases)
      else Blocklist.screen(df, "doc_id", "text", phrases)
    out.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_patterns"), r.getAs[Long]("n_occurrences"),
          r.getAs[String]("matched"), r.getAs[Boolean]("keep")))
    }.toMap
  }

  private val fixture = Seq(
    // plain hit + zero-hit canary never fires
    1L -> "a hash join b",
    // self-bordered phrase chain: "table table table" holds ONE
    // leftmost non-overlapping "table table" (second starts inside
    // the first's consumption)
    2L -> "table table table",
    // two disjoint occurrences
    3L -> "table table x table table",
    // self-overlap of a 2-char pattern: "aaaa" -> 2 leftmost
    // non-overlapping "aa", "aaa" -> 1
    4L -> "aaaa and aaa",
    // multiple patterns in one doc, matched list sorted by phrase
    5L -> "hash join table table",
    // clean doc
    6L -> "nothing to see",
    // empty text
    7L -> "")

  private val expected = Map(
    1L -> ((1L, 1L, "hash join", false)),
    2L -> ((1L, 1L, "table table", false)),
    3L -> ((1L, 2L, "table table", false)),
    4L -> ((1L, 3L, "aa", false)),
    5L -> ((2L, 2L, "hash join,table table", false)),
    6L -> ((0L, 0L, "", true)),
    7L -> ((0L, 0L, "", true)))

  test("codegen tier: planted fixture — non-overlap counts, sorted matched list, keep verdict") {
    assert(screenMap(fixture, ac = false) == expected)
  }

  test("AC tier: identical verdicts on the planted fixture") {
    assert(screenMap(fixture, ac = true) == expected)
  }

  test("tier equality: AC == codegen frame-for-frame on the harness corpus") {
    val a = QualityQueries.qBlocklistFilter(spark, sf001).collect().toSeq
    val b = QualityQueries.qBlocklistAc(spark, sf001).collect().toSeq
    assert(a == b)
    // the corpus really exercises the gate: hits and clean docs both present
    assert(a.exists(!_.getAs[Boolean]("keep")))
    assert(a.exists(_.getAs[Boolean]("keep")))
  }

  private def exciseMap(rows: Seq[(Long, String)], ps: Seq[String]) =
    Blocklist.excise(rows.toDF("doc_id", "text"), "doc_id", "text", ps)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_excised"), r.getAs[String]("text_clean")))).toMap

  test("excise: markers replace every non-overlapping hit; clean text is byte-identical") {
    val got = exciseMap(Seq(
      1L -> "a hash join b hash join",
      2L -> "table table table",
      3L -> "untouched text"), phrases)
    assert(got(1L) == ((2L, "a <BLOCKED> b <BLOCKED>")))
    // self-border: ONE leftmost occurrence excised, the dangling
    // " table" survives
    assert(got(2L) == ((1L, "<BLOCKED> table")))
    assert(got(3L) == ((0L, "untouched text")))
  }

  test("excise: cross-phrase overlap resolves by the frozen sorted chain order") {
    // sorted order applies "aa" before "table table" — irrelevant
    // here; the pinned case is "aa" vs "ab overlap": phrases sorted
    // ("ab","ba"), "ab" excised first destroys "ba"'s match in "aba b"
    val got = exciseMap(Seq(1L -> "aba b"), Seq("ab", "ba"))
    assert(got(1L) == ((1L, "<BLOCKED>a b")))
  }

  test("phrases with apostrophes/backslashes are plain data in both tiers (r17 hardening)") {
    val ps = Seq("don't panic", """back\slash""")
    val rows = Seq(
      1L -> """we said don't panic and don't panic again""",
      2L -> """a back\slash here""",
      3L -> "clean")
    val a = screenMapWith(rows, ps, ac = false)
    val b = screenMapWith(rows, ps, ac = true)
    assert(a == b)
    assert(a(1L) == ((1L, 2L, "don't panic", false)))
    assert(a(2L) == ((1L, 1L, """back\slash""", false)))
    assert(a(3L) == ((0L, 0L, "", true)))
    val ex = exciseMap(rows, ps)
    assert(ex(1L) == ((2L, "we said <BLOCKED> and <BLOCKED> again")))
  }

  test("excise: a pre-existing marker in the input does not inflate n_excised (r17 ADVICE)") {
    val got = exciseMap(Seq(
      1L -> "x <BLOCKED> y hash join z",
      2L -> "<BLOCKED> only"), phrases)
    assert(got(1L) == ((1L, "x <BLOCKED> y <BLOCKED> z")))
    assert(got(2L) == ((0L, "<BLOCKED> only")))
  }

  test("NULL text reads as empty in both tiers: 0/0/''/keep") {
    val df = Seq((1L, Option("a hash join")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    Seq(Blocklist.screen(df, "doc_id", "text", phrases),
        Blocklist.screenAc(df, "doc_id", "text", phrases)).foreach { out =>
      val m = out.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_patterns"), r.getAs[Long]("n_occurrences"),
          r.getAs[String]("matched"), r.getAs[Boolean]("keep")))).toMap
      assert(m(2L) == ((0L, 0L, "", true)))
      assert(m(1L) == ((1L, 1L, "hash join", false)))
    }
  }

  private def screenMapWith(rows: Seq[(Long, String)], ps: Seq[String],
      ac: Boolean) = {
    val df = rows.toDF("doc_id", "text")
    val out =
      if (ac) Blocklist.screenAc(df, "doc_id", "text", ps)
      else Blocklist.screen(df, "doc_id", "text", ps)
    out.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_patterns"), r.getAs[Long]("n_occurrences"),
          r.getAs[String]("matched"), r.getAs[Boolean]("keep")))
    }.toMap
  }

  test("automaton: dictionary-suffix outputs fire (pattern inside a longer pattern)") {
    val ac = AhoCorasick.compile(Array("he", "she", "his", "hers"))
    val counts = ac.countNonOverlapping("ushers")
    // "ushers" contains she (1..3), he (2..3), hers (2..5)
    assert(counts.toSeq == Seq(1, 1, 0, 1))
  }

  test("automaton: counts match brute-force leftmost non-overlapping on random strings") {
    val pats = Array("ab", "aba", "bb", "aab")
    val ac = AhoCorasick.compile(pats)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(30)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      val brute = pats.map { p =>
        var c = 0; var i = 0
        while (i >= 0 && i + p.length <= s.length) {
          val j = s.indexOf(p, i)
          if (j < 0) i = -1 else { c += 1; i = j + p.length }
        }
        c
      }
      assert(ac.countNonOverlapping(s).toSeq == brute.toSeq, s"text=$s")
    }
  }
}
