package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Multi-phrase blocklist screening — the banned-phrase gate every
  * curation pipeline runs before training (policy phrases, boilerplate
  * markers, licensing strings). Two tiers with IDENTICAL output
  * contracts, so the second is oracle-checked by the first's SQL twin:
  *
  *  - [[screen]]: the CODEGEN tier — the phrase list is a literal
  *    array and the match/count work is higher-order-function algebra
  *    (`filter` + `aggregate` over `contains`/`replace`), all inside
  *    whole-stage codegen. One narrow pass, no shuffle, no UDF. Cost
  *    is O(K · |text|) per row (each phrase is an independent
  *    substring scan) — the right tier for the tens-of-phrases
  *    policy lists that dominate in practice.
  *  - [[screenAc]]: the AHO–CORASICK tier — the phrase list compiles
  *    to a goto/fail automaton on the driver (Aho & Corasick, CACM
  *    1975), broadcast once, and each document is scanned in ONE pass
  *    regardless of K: O(|text| + matches). The tier for the
  *    thousands-of-patterns blocklists (URL blocklists, contamination
  *    canaries) where K substring scans per row would multiply the
  *    corpus read cost. `mapPartitions` over (id, text) rows — the
  *    documented last-resort exemption (genuinely imperative per-char
  *    automaton state), with the automaton shared per-executor via
  *    broadcast, never rebuilt per row.
  *
  * Occurrence counting is LEFTMOST NON-OVERLAPPING per pattern,
  * independently across patterns — exactly the `replace`-arithmetic
  * count `(len(t) - len(replace(t, p, ''))) / len(p)` the codegen tier
  * and the SQL oracle compute, so a self-bordered pattern (e.g.
  * "table table" inside "table table table") counts identically in
  * both tiers: the automaton tracks the last consumed end offset per
  * pattern and skips matches that begin inside the previous
  * consumption. Cross-pattern overlaps are NOT suppressed (each
  * pattern counts independently), matching the per-phrase replace
  * semantics.
  *
  * Output per input row: (id, n_patterns, n_occurrences, matched,
  * keep) — matched is the comma-joined hit list in sorted-phrase
  * order, keep is the clean verdict (no phrase present). The screen is
  * a FLAG pass, not a filter: emitting the verdict per document keeps
  * the op composable with quality scoring and lets the caller decide
  * drop vs. audit.
  *
  * 100 TB shape: both tiers are embarrassingly parallel projections —
  * no shuffle, no aggregation, nothing driver-side but the automaton
  * compile (bounded by total pattern bytes, broadcast once). The scan
  * cost is the corpus read itself.
  */
object Blocklist {

  /** Normalize the phrase list once: sorted (deterministic matched
    * order), non-empty, distinct. Both tiers and the oracle builder
    * share this so the output contract is identical. */
  def normalized(phrases: Seq[String]): Array[String] = {
    val out = phrases.filter(_.nonEmpty).distinct.sorted.toArray
    require(out.nonEmpty, "empty blocklist")
    out
  }

  /** Leftmost non-overlapping occurrence count of literal `p` in `t` —
    * the `replace`-arithmetic identity both tiers and the SQL oracle
    * share. Exact: the length delta is count·len(p) by construction,
    * so the division is an integral double and the cast is lossless. */
  private def occurrences(t: Column, p: Column): Column =
    ((length(t) - length(replace(t, p))) / length(p)).cast("long")

  /** Codegen tier: higher-order-function screening over a `lit()`
    * phrase array — phrases are plain data, never spliced into SQL
    * text, so any byte sequence (apostrophes, backslashes) is a legal
    * phrase (r17 verdict hardening). NULL text coalesces to '' so both
    * tiers share one null semantics: 0 / 0 / '' / keep=true. */
  def screen(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val ps = normalized(phrases)
    val arr = array(ps.map(lit(_)): _*)
    df.select(col(idCol),
        coalesce(col(textCol).cast("string"), lit("")).as("_t"))
      .select(col(idCol),
        filter(arr, p => col("_t").contains(p)).as("_m"),
        aggregate(arr, lit(0L),
          (acc, p) => acc + occurrences(col("_t"), p)).as("n_occurrences"))
      .select(col(idCol),
        size(col("_m")).cast("long").as("n_patterns"),
        col("n_occurrences"),
        array_join(col("_m"), ",").as("matched"),
        (size(col("_m")) === 0).as("keep"))
  }

  /** Aho–Corasick tier: one automaton pass per document. Identical
    * output contract to [[screen]] (same phrase normalization, same
    * leftmost non-overlapping counts), proven by BlocklistSpec's
    * tier-equality check and by sharing [[screen]]'s SQL oracle as a
    * hash gate. */
  def screenAc(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val ps = normalized(phrases)
    val spark = df.sparkSession
    import spark.implicits._
    val bAc = spark.sparkContext.broadcast(AhoCorasick.compile(ps))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bAc.value
        val names = ac.patterns
        it.map { case (id, text) =>
          val counts = ac.countNonOverlapping(if (text == null) "" else text)
          var i = 0; var nPat = 0L; var nOcc = 0L
          val hits = new mutable.StringBuilder
          while (i < counts.length) {
            if (counts(i) > 0) {
              nPat += 1; nOcc += counts(i)
              if (hits.nonEmpty) hits += ','
              hits ++= names(i)
            }
            i += 1
          }
          (id, nPat, nOcc, hits.result(), nPat == 0L)
        }
      }
      .toDF(idCol, "n_patterns", "n_occurrences", "matched", "keep")
  }

  /** Excision — the rewrite downstream of the screen (the same
    * detect→transform split as span dedup → span excision): every
    * leftmost non-overlapping occurrence of every phrase is replaced
    * by `marker`, phrases applied in NORMALIZED (sorted) order. The
    * chain is ORDER-SENSITIVE where phrases overlap each other — the
    * frozen sorted order IS the contract, exactly like the frozen BPE
    * merge table, and the SQL oracle replays the identical chain.
    * `n_excised` counts the markers actually inserted (which can
    * differ from [[screen]]'s per-phrase independent counts when one
    * phrase's excision destroys another's match — BlocklistSpec pins
    * such a case).
    *
    * `n_excised` is MARKER-DELTA arithmetic: markers in the rewritten
    * text minus markers in the (coalesced) input — two extra replace
    * scans, so the whole projection is LINEAR in phrase count where the
    * r18 spelling (each step's pre-replace count re-embedding the full
    * prefix chain) grew the expression tree quadratically and would
    * blow Catalyst analysis at real frozen-blocklist sizes (r18
    * ADVICE). The delta equals inserted-marker count exactly because
    * the require below bans every geometry that could decouple them:
    * the marker is UNBORDERED (no non-empty proper prefix = suffix, so
    * marker occurrences can never overlap and the non-overlapping
    * count is plain occurrence count), and no phrase shares a border
    * with the marker in either direction (so a phrase match can never
    * straddle a marker — pre-existing and earlier-step markers survive
    * every later replace intact, and no spurious marker can assemble
    * across a replacement boundary). A pre-existing input marker
    * cancels in the subtraction (the r17 ADVICE case, still pinned).
    *
    * CONTRACT CHANGE (r19): the require is STRICTER than the r18
    * containment-only check — a (phrases, marker) pair where a phrase
    * shares a border with the marker (e.g. a phrase ending in '<'
    * under the default marker) was counted exactly by the r18
    * per-step spelling but now fails fast at plan build. Callers with
    * such a pair must pick a marker sharing no border with any phrase
    * (always possible: markers are caller-chosen sentinels) — the
    * loud failure is deliberate, because under marker-delta counting
    * a border overlap would silently miscount instead.
    *
    * One codegen projection; the 100 TB cost is the corpus rewrite
    * itself. */
  def excise(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], marker: String = "<BLOCKED>"): DataFrame = {
    val ps = normalized(phrases)
    requireMarkerSafe(ps, marker)
    // phrases enter as lit() data, never SQL text
    val t0 = coalesce(col(textCol).cast("string"), lit(""))
    val clean = ps.foldLeft(t0) { (acc, p) => replace(acc, lit(p), lit(marker)) }
    // two-step select: `clean` materializes once; the marker-delta
    // count reads the materialized column (CollapseProject keeps the
    // boundary — the chain is non-cheap and multiply referenced)
    df.select(col(idCol),
        occurrences(t0, lit(marker)).as("_m0"),
        clean.as("text_clean"))
      .select(col(idCol),
        (occurrences(col("text_clean"), lit(marker)) - col("_m0"))
          .as("n_excised"),
        col("text_clean"))
  }

  /** The exactness preconditions of [[excise]]'s marker-delta count
    * (and of any marker-based rewrite): marker unbordered, no
    * containment either way, no border overlap either way. Fails
    * loudly — a violating (phrases, marker) pair needs a different
    * marker, not a silent miscount. */
  private def requireMarkerSafe(ps: Array[String], marker: String): Unit = {
    require(marker.nonEmpty, "empty marker")
    require((1 until marker.length).forall(l =>
        marker.substring(0, l) != marker.substring(marker.length - l)),
      "marker must be unbordered (no proper prefix equal to a suffix)")
    require(ps.forall(p => !p.contains(marker) && !marker.contains(p)),
      "marker must not collide with any phrase")
    require(ps.forall(p =>
        (1 until marker.length).forall { l =>
          !p.startsWith(marker.substring(marker.length - l)) &&
          !p.endsWith(marker.substring(0, l))
        }),
      "no phrase may share a border with the marker")
  }

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** The DuckDB twin of [[excise]] — replays the identical replace
    * chain AND the identical marker-delta count (markers in the
    * rewritten text minus markers in the coalesced input), so the twin
    * stays linear in phrase count in lockstep with the operator. */
  def exciseSelectSql(idCol: String, textExpr: String,
      phrases: Seq[String], marker: String = "<BLOCKED>"): String = {
    val ps = normalized(phrases)
    requireMarkerSafe(ps, marker)
    val qm = sqlQuote(marker)
    // mirror the Spark tiers' NULL-to-'' coalesce so the twin shares
    // their null semantics instead of propagating NULL through the
    // replace chain
    val t0 = s"coalesce($textExpr, '')"
    val chain = ps.foldLeft(t0) { (acc, p) =>
      s"replace($acc, '${sqlQuote(p)}', '$qm')"
    }
    def markers(e: String): String =
      s"(length($e) - length(replace($e, '$qm', ''))) // length('$qm')"
    s"""SELECT $idCol,
       |  CAST(${markers(chain)} - ${markers(t0)} AS BIGINT) AS n_excised,
       |  $chain AS text_clean""".stripMargin
  }

  /** The DuckDB twin of [[screen]] over a text column — shared by both
    * tiers' oracle rows (the AC tier's output contract is the same
    * frame). `textExpr` is the SQL expression for the text. */
  def oracleSelectSql(idCol: String, textExpr0: String,
      phrases: Seq[String]): String = {
    val ps = normalized(phrases)
    // same NULL-to-'' coalesce as the Spark tiers (one null semantics)
    val textExpr = s"coalesce($textExpr0, '')"
    val arr = ps.map(p => s"'${sqlQuote(p)}'").mkString("[", ", ", "]")
    s"""SELECT $idCol,
       |  CAST(len(list_filter($arr, p -> contains($textExpr, p))) AS BIGINT) AS n_patterns,
       |  CAST(list_sum(list_transform($arr,
       |    p -> (length($textExpr) - length(replace($textExpr, p, ''))) // length(p))) AS BIGINT) AS n_occurrences,
       |  coalesce(array_to_string(list_filter($arr, p -> contains($textExpr, p)), ','), '') AS matched,
       |  len(list_filter($arr, p -> contains($textExpr, p))) = 0 AS keep""".stripMargin
  }
}

/** Classic goto/fail Aho–Corasick automaton over `Char`. Node maps are
  * immutable `Map[Char, Int]` (tiny fan-out on text alphabets;
  * amortized O(1) per input char), `fail` and the dictionary-suffix
  * output closure are precomputed at compile time, so the scan loop
  * allocates nothing but the per-call count array. Serializable for
  * broadcast. */
final class AhoCorasick private (
    gotoMap: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val patterns: Array[String]) extends Serializable {

  /** Leftmost non-overlapping occurrence count per pattern (counts
    * indexed like [[patterns]]). Overlaps ACROSS patterns are counted
    * independently — see the semantics note on [[Blocklist]]. */
  def countNonOverlapping(text: String): Array[Int] = {
    val counts = new Array[Int](patterns.length)
    val lastEnd = Array.fill(patterns.length)(-1)
    var st = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (st != 0 && !gotoMap(st).contains(c)) st = fail(st)
      st = gotoMap(st).getOrElse(c, 0)
      val hits = out(st)
      var h = 0
      while (h < hits.length) {
        val pid = hits(h)
        val start = i - patterns(pid).length + 1
        if (start > lastEnd(pid)) { counts(pid) += 1; lastEnd(pid) = i }
        h += 1
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Build the automaton: trie insert, BFS fail links, dictionary-
    * suffix output closure merged per node. O(total pattern chars). */
  def compile(patterns: Array[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty))
    val gotoB = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var st = 0
      p.foreach { c =>
        st = gotoB(st).getOrElseUpdate(c, {
          gotoB += mutable.HashMap.empty[Char, Int]
          outB += Nil
          gotoB.length - 1
        })
      }
      outB(st) = pid :: outB(st)
    }
    val n = gotoB.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotoB(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoB(r).foreach { case (c, s) =>
        queue += s
        var st = fail(r)
        while (st != 0 && !gotoB(st).contains(c)) st = fail(st)
        val f = gotoB(st).get(c) match {
          case Some(t) if t != s => t
          case _                 => 0
        }
        fail(s) = f
        // BFS order guarantees fail(s)'s closure is already complete
        outB(s) = outB(s) ++ outB(f)
      }
    }
    new AhoCorasick(gotoB.map(m => Map.from(m)).toArray, fail,
      outB.map(_.toArray.sorted).toArray, patterns)
  }
}
