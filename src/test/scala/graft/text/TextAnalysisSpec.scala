package graft.text

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.queries.TextQueries

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      ("the cat is on the mat and it is not a dog", "en"),
      ("der hund ist nicht auf der matte und das ist gut", "de"),
      ("el gato es un animal y no es un perro", "es"),
      ("le chat est dans la maison et il est une bête", "fr"),
      ("的 是 不 了 在 我", "zh"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "expected")
    val got = df.select(TextAnalysis.langId(col("text")).as("got"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("token counts: whitespace vs BPE-ish on punctuation-heavy text") {
    val df = Seq(
      ("hello world", 2, 2),
      ("hello, world!", 2, 4),       // "hello" "," "world" "!"
      ("", 0, 0),
      ("   ", 0, 0),
      ("a1b2", 1, 4),                // letter/digit runs split
      ("don't stop", 2, 4)           // "don" "'" "t" "stop"
    ).toDF("text", "ws", "bpe")
    df.select(TextAnalysis.wsTokenCount(col("text")).as("g_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("g_bpe"),
        col("ws"), col("bpe"))
      .collect().foreach { r =>
        assert(r.getInt(0) == r.getInt(2), s"ws: $r")
        assert(r.getInt(1) == r.getInt(3), s"bpe: $r")
      }
  }

  test("quality score: clean prose scores high, degenerate text low") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog and it is a fine day in the park today ok", "good"),
      ("!!! ??? ### $$$ %%%", "bad"),
      ("x", "bad")
    ).toDF("text", "kind")
    val scored = TextAnalysis.withQualitySignals(df).select(col("kind"), col("quality_score"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val good = scored.filter(_._1 == "good").map(_._2).head
    scored.filter(_._1 == "bad").foreach { case (_, s) =>
      assert(good > s + 0.3, s"good=$good bad=$s")
    }
  }

  test("normalize: lowercase, punctuation to space, whitespace collapsed, trimmed") {
    val df = Seq(
      ("  Hello,   WORLD!! (test) ", "hello world test"),
      ("a-b_c.d", "a b c d"),
      ("...", ""),
      ("Déjà vu 123", "déjà vu 123")
    ).toDF("text", "expected")
    df.select(TextAnalysis.normalize(col("text")).as("got"), col("expected"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("fingerprint: whitespace-insensitive, order-sensitive") {
    val df = Seq(
      ("a b c", "A"), ("a  b   c", "A2"), ("c b a", "B"), ("a b d", "C")
    ).toDF("text", "tag")
    val fp = df.select(col("tag"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("A") == fp("A2"))   // extra whitespace normalized
    assert(fp("A") != fp("B"))    // order matters
    assert(fp("A") != fp("C"))    // content matters
  }

  test("PII redaction: emails, IPs, phones scrubbed; word-embedded lookalikes kept") {
    val df = Seq(
      ("mail bob.smith+x@corp.example.org now", "mail <EMAIL> now", 1, 0, 0),
      ("host 192.168.001.255 up", "host <IP> up", 0, 1, 0),
      ("call 555-867-5309 today", "call <PHONE> today", 0, 0, 1),
      ("a@b.co 1.2.3.4 111-222-3333", "<EMAIL> <IP> <PHONE>", 1, 1, 1),
      // \b never fires inside a word run: digits glued to letters are
      // not a phone; a trailing version string is not an IP
      ("order x555-123-4567y build v1.2.3.4beta", "order x555-123-4567y build v1.2.3.4beta", 0, 0, 0),
      ("no pii here", "no pii here", 0, 0, 0)
    ).toDF("text", "want", "ne", "ni", "np")
    val counts = TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    df.select(Seq(TextAnalysis.redactPii(col("text")).as("got"), col("want"),
        col("ne"), col("ni"), col("np")) ++ counts: _*)
      .collect().foreach { r =>
        assert(r.getString(0) == r.getString(1), r)
        assert(r.getInt(5) == r.getInt(2) && r.getInt(6) == r.getInt(3)
          && r.getInt(7) == r.getInt(4), r)
      }
  }

  test("fingerprint classes: whitespace copies collapse, reversed copies stay apart") {
    val out = TextQueries.qFingerprintClasses(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val off = TextQueries.FpClassOffset
    assert(out.size == 1500) // 500 docs x 3 corpus members
    (0L until 500L).foreach { i =>
      assert(out(i) == i, s"original $i not its own class rep")
      assert(out(i + off) == i, s"whitespace copy of $i escaped the class")
      // every harness doc has >= 2 distinct tokens in distinct order at
      // sf0.001, so the reversed copy must land in its own class
      assert(out(i + 2 * off) == i + 2 * off, s"reversed copy of $i collapsed")
    }
  }

  test("repetition signals: a degenerate doc scores high, varied prose low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),   // one token repeated
      (2L, "the quick brown fox jumps over")    // all distinct
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.qTextRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // 4 trigrams, 1 distinct -> rep 0.75; top token 6/6
    assert(out(1L).getAs[Long]("n_trigrams") == 4)
    assert(out(1L).getAs[Long]("n_distinct_trigrams") == 1)
    assert(math.abs(out(1L).getAs[Double]("rep_ratio") - 0.75) < 1e-12)
    assert(math.abs(out(1L).getAs[Double]("top_token_ratio") - 1.0) < 1e-12)
    assert(out(2L).getAs[Double]("rep_ratio") == 0.0)
    assert(math.abs(out(2L).getAs[Double]("top_token_ratio") - 1.0 / 6) < 1e-12)
  }

  test("bpe pairs: top-k plan is TakeOrderedAndProject, never a global window") {
    val plan = TextQueries.qBpePairs(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("windowspecdefinition"), plan.take(2000))
    val rows = TextQueries.qBpePairs(spark, sf001).collect()
    assert(rows.length == 20)
    // counts non-increasing, pairs are two space-joined units
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[String]("pair").split(" ").length == 2))
  }

  test("heavy hitters: exact-phase sketch equals true top-10 term counts") {
    // maxItemsTracked (100k) far exceeds the harness vocabulary, so the
    // frequent-items sketch never sheds and its counts are EXACT
    val got = TextQueries.qHeavyHitters(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 10)
    val exact = Tables.documents(spark, sf001)
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").count()
      .orderBy(col("count").desc, col("term"))
      .limit(10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toMap == exact.toMap, s"sketch ${got.toSeq} vs exact ${exact.toSeq}")
  }

  test("harness corpus: docs classify en or und (english-vocab synthetic texts)") {
    val out = TextQueries.qTextLangId(spark, sf001).collect()
    assert(out.length == 500)
    val counts = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(counts.keySet.subsetOf(Set("en", "und")), s"got $counts")
    // the vocab contains 'the' and 'a', so most docs hit the en profile
    assert(counts.getOrElse("en", 0) > 400, s"got $counts")
  }

  test("quality signals on harness corpus are in range") {
    val rows = TextQueries.qTextQuality(spark, sf001).collect()
    rows.foreach { r =>
      val score = r.getAs[Double]("quality_score")
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getAs[Double]("alpha_ratio") > 0.5) // plain word corpus
      assert(r.getAs[Double]("punct_ratio") == 0.0)
    }
  }

  test("punct_ratio counts Unicode punctuation and symbols, not just ASCII") {
    // «guillemets», em-dash —, CJK 。, and € are outside POSIX \p{Punct};
    // the DuckDB oracles count [\p{P}\p{S}], so the Spark side must too.
    // Hand counts: «x» → 2 punct of 3 chars; a—b。 → 2 of 4; €5 → 1 of 2;
    // ASCII a,b! → 2 of 4 (classes agree on ASCII).
    val df = Seq(
      ("«x»", 2.0 / 3), ("a—b。", 2.0 / 4), ("€5", 1.0 / 2), ("a,b!", 2.0 / 4)
    ).toDF("text", "expected")
    TextAnalysis.withQualitySignals(df)
      .select(col("text"), col("punct_ratio"), col("expected"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
          s"'${r.getString(0)}': got ${r.getDouble(1)}, want ${r.getDouble(2)}")
      }
    // and the composite score on a non-ASCII-punct doc matches the
    // hand-computed formula: "a —b" → n_tokens=2, alpha=2/4, punct=1/4
    // (the em-dash), stopword_ratio=1/2 ("a" is in the en profile)
    val s = TextAnalysis.withQualitySignals(Seq("a —b").toDF("text"))
      .select(col("quality_score")).head().getDouble(0)
    val want = 0.25 * (2.0 / 20) + 0.25 * (2.0 / 4) +
      0.25 * (1 - 1.0 / 4) + 0.25 * 1.0 // min(0.5·5, 1)
    assert(math.abs(s - want) < 1e-12, s"got $s want $want")
  }

  test("hashed contamination tier == literal tier, row for row") {
    // same values through 8-byte hashed trigram keys (collisions are the
    // only possible divergence — vanishing at these sizes)
    val lit = TextQueries.qContamination(spark, sf001).collect()
    val hashed = TextQueries.qContaminationHashed(spark, sf001).collect()
    assert(lit.length == hashed.length && lit.nonEmpty)
    lit.zip(hashed).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3),
        s"diverged: $a vs $b")
    }
  }

  test("stripMarkup: comments die, tags die, entities decode AFTER tag strip, ws collapses") {
    val got = Seq(
      "<p>a  <b>bold</b> b</p>",
      "<!-- secret --> visible",
      "<!--\n<div>multi-line secret</div>\nnote\n--> kept",
      "&lt;script&gt;alert(1)&lt;/script&gt;", // encoded markup must SURVIVE as text
      "A &amp;&amp; B &nbsp; C",
      "")
      .toDF("h").select(TextAnalysis.stripMarkup(col("h"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq(
      "a bold b",
      "visible",
      "kept", // multi-line comment content must NOT leak
      "<script>alert(1)</script>",
      "A && B C",
      ""))
  }

  test("dedupLines: first occurrence wins, order preserved, distinct lines kept") {
    val out = TextAnalysis.dedupLines(
      Seq((1L, "b\na\nb\nc\na\nb"), (2L, "x")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "b\na\nc")
    assert(out(2L) == "x")
  }

  test("dedupLines contract: NULL text survives as empty doc; extra columns dropped") {
    val in = Seq((1L, Option("a\na"), "keep"), (2L, Option.empty[String], "keep"))
      .toDF("doc_id", "text", "extra")
    val out = TextAnalysis.dedupLines(in)
    assert(out.columns.toSeq == Seq("doc_id", "text"),
      "output schema is exactly (id, text) — callers re-join the rest by id")
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 2, "a NULL-text row must NOT be dropped")
    assert(m(1L) == "a")
    assert(m(2L) == "")
  }

  test("bloom contamination tier == hashed tier; pre-filter sits before the train distinct") {
    // no false negatives ⇒ no lost hits; false positives die in the
    // exact join ⇒ row-identical output
    val hashed = TextQueries.qContaminationHashed(spark, sf001).collect()
    val bloom = TextQueries.qContaminationBloom(spark, sf001).collect()
    assert(hashed.length == bloom.length && hashed.nonEmpty)
    hashed.zip(bloom).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3),
        s"diverged: $a vs $b")
    }
    // the probe is in the plan (the 100 TB contract: train shingles are
    // dropped by the sketch BEFORE the distinct's shuffle)
    val plan = TextQueries.qContaminationBloom(spark, sf001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("bloom pre-filter selectivity: survivors ≈ true overlap + the configured fp rate") {
    import spark.implicits._
    // disjoint-by-construction sides: train = 30k distinct longs,
    // eval = 1k longs of which 100 overlap train — survivors of the
    // eval-sized bloom must be ≈ 100 + fp_rate × 29 900, nowhere near
    // the full train side (the pruning that shrinks the 100 TB shuffle)
    val train = (0L until 30000L).toDF("sh")
    val ev = ((0L until 100L) ++ (1000000L until 1000900L)).toDF("sh")
    val bloomBytes = ev.agg(
      graft.functions.Bloom.bloomAgg(col("sh"), 1000L).as("b"))
      .head().getAs[Array[Byte]]("b")
    val survivors = train.filter(
      graft.functions.Bloom.mightContain(lit(bloomBytes), col("sh"))).count()
    assert(survivors >= 100, "no false negatives: every true overlap survives")
    // 8 bits/item ⇒ ~2% fp; allow 4× headroom and it is still a >95% cut
    assert(survivors <= 100 + (0.08 * 29900).toLong,
      s"pre-filter barely pruned: $survivors of 30000 train keys survived")
  }

  test("contamination: only eval docs appear, ratios bounded, verbatim dup fully contaminated") {
    val out = TextQueries.qContamination(spark, sf001).cache()
    assert(out.filter(col("doc_id") % 2 === 0).count() == 0)
    assert(out.filter(col("contamination_ratio") < 0.0 ||
      col("contamination_ratio") > 1.0).count() == 0)
    assert(out.filter(col("n_contaminated") > col("n_shingles")).count() == 0)
    out.unpersist()

    // hand-built fixture: eval doc 1 is a verbatim copy of train doc 0
    // → ratio 1.0; eval doc 3 shares no trigram → ratio 0.0
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "one two three four five"),
      (5L, "ab")) // < 3 tokens → zero shingles, ratio 0
      .toDF("doc_id", "text")
    val tmp = graft.TempDirs.create("contam_fixture")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextQueries.qContamination(spark, tmp.toString)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) == 1.0, s"verbatim dup: $r")
    assert(r(3L) == 0.0, s"disjoint doc: $r")
    assert(r(5L) == 0.0, s"short doc: $r")
  }

  test("gopher rules: each rule fails on its own counter-example doc") {
    val mkWords = (n: Int) => Seq.fill(n)("word").mkString(" ")
    val good = ("join hash " + mkWords(28)).trim           // 30 words, 2 stops
    val docs = Seq(
      (0L, good),                                          // passes all
      (1L, "join hash " + mkWords(8)),                     // too few words
      (2L, ("join hash " + mkWords(98)).trim),             // too many words
      (3L, "join hash " + Seq.fill(28)("a").mkString(" ")),// mean len < 3
      (4L, "join hash " + Seq.fill(28)("12345").mkString(" ")), // alpha-word ratio 2/30
      (5L, "join hash " + Seq.fill(28)("####word####").mkString(" ")), // symbol ratio
      (6L, mkWords(30)))                                   // zero stopword hits
      .toDF("doc_id", "text")
    val r = TextAnalysis.withGopherRules(docs)
      .select("doc_id", "r_word_count", "r_word_len", "r_alpha_words",
        "r_symbol_ratio", "r_stopwords", "keep")
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4),
          x.getBoolean(5), x.getBoolean(6))).toMap
    assert(r(0L) == ((true, true, true, true, true, true)), s"good doc: ${r(0L)}")
    assert(!r(1L)._1 && !r(1L)._6, "short doc fails word count")
    assert(!r(2L)._1, "long doc fails word count")
    assert(!r(3L)._2, "single-char words fail mean word length")
    assert(!r(4L)._3, "digit words fail the alpha-word rule")
    assert(!r(5L)._4, s"symbol-heavy doc fails the symbol rule: ${r(5L)}")
    assert(!r(6L)._5, "stopword-free doc fails the stopword rule")
  }

  test("q_quality_gopher over the fixture: flags recompute from the signals") {
    val out = TextQueries.qQualityGopher(spark, sf001).cache()
    assert(out.count() > 0)
    // n_words bounds recompute r_word_count exactly
    val bad = out.filter(
      col("r_word_count") =!= (col("n_words") >= 25 && col("n_words") <= 80) ||
        col("keep") =!= (col("r_word_count") && col("r_word_len") &&
          col("r_alpha_words") && col("r_symbol_ratio") && col("r_stopwords")))
    assert(bad.count() == 0)
    // the gate must be non-degenerate on the harness corpus: both
    // verdicts occur (doc lengths run 10-99 words vs the 25-80 band)
    val keeps = out.groupBy("keep").count().count()
    assert(keeps == 2, "expected both keep=true and keep=false docs")
    out.unpersist()
  }

  test("canonicalUrl: case folds scheme+host only, strips utm/fragment/trailing slash") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase; PATH case preserved (RFC 3986 §6.2.2.1)
      ("HTTPS://Example.COM/Mixed/Case", "https://example.com/Mixed/Case"),
      // fragment dropped
      ("https://h.com/p#section-2", "https://h.com/p"),
      // utm_* dropped, non-utm params kept in original order
      ("https://h.com/p?utm_source=x&b=2&utm_campaign=9&a=1", "https://h.com/p?b=2&a=1"),
      // all params tracking → '?' disappears entirely
      ("https://h.com/p?utm_source=x&utm_medium=y", "https://h.com/p"),
      // trailing slash run stripped; root path collapses
      ("https://h.com/p/1///", "https://h.com/p/1"),
      ("https://h.com/", "https://h.com"),
      // already canonical → fixpoint
      ("https://h.com/p/1?a=1", "https://h.com/p/1?a=1"),
      // explicit non-default port is a DISTINCT origin — preserved
      ("https://H.com:8443/x", "https://h.com:8443/x"),
      ("http://h.com:8080/x", "http://h.com:8080/x"),
      // the scheme's default port IS the same origin — dropped
      ("https://h.com:443/x", "https://h.com/x"),
      ("http://h.com:80/x", "http://h.com/x"),
      // userinfo preserved verbatim (case-sensitive per RFC 3986)
      ("https://User@h.com/x", "https://User@h.com/x"),
      ("https://u:Pw@H.COM:9443/x/", "https://u:Pw@h.com:9443/x"),
      // bracketed IPv6 host: inner ':' is not a port separator
      ("https://[2001:DB8::1]/x", "https://[2001:db8::1]/x"),
      ("https://[2001:DB8::1]:8443/x", "https://[2001:db8::1]:8443/x"))
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url"))).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalUrl($in)")
    }
  }

  test("canonicalUrl is idempotent over the component grid") {
    import spark.implicits._
    // every combination of the components the canonicalizer touches:
    // canonical(canonical(u)) == canonical(u) must hold for all of them
    val urls = for {
      scheme <- Seq("http", "HTTPS")
      user <- Seq("", "User:pw@")
      host <- Seq("h.com", "WWW.Ex.COM", "[2001:DB8::1]")
      port <- Seq("", ":443", ":8443")
      path <- Seq("", "/p/1", "/Mixed/Case///")
      query <- Seq("", "?utm_source=x", "?b=2&utm_medium=y&a=1")
      frag <- Seq("", "#sec")
    } yield s"$scheme://$user$host$port$path$query$frag"
    val once = urls.toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url")).as("c1"))
    val twice = once.select(col("c1"),
      TextAnalysis.canonicalUrl(col("c1")).as("c2"))
    val bad = twice.filter(col("c1") =!= col("c2")).collect()
    assert(bad.isEmpty,
      s"not idempotent on ${bad.length}: ${bad.take(5).mkString("; ")}")
  }

  test("q_url_normalize: every canonical absorbs both planted spellings of each doc") {
    val out = TextQueries.qUrlNormalize(spark, sf001).cache()
    assert(out.count() > 0)
    // each doc plants exactly 2 raw forms, both distinct → n_urls ==
    // n_raw_forms == 2×(docs in group), always even
    val bad = out.filter(col("n_urls") =!= col("n_raw_forms")
      || col("n_urls") % 2 =!= 0 || col("n_urls") < 2)
    assert(bad.count() == 0)
    // no canonical URL retains uppercase, utm params, fragments, or a
    // trailing slash — the whole point of the pass
    assert(out.filter(col("url").rlike("[A-Z]|utm_|#|/$")).count() == 0)
    out.unpersist()
  }

  test("vocab growth: buckets cover [0,20), n_new sums to distinct shingles, curve cumulative") {
    val out = TextQueries.qVocabGrowth(spark, sf001).collect()
    assert(out.nonEmpty && out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 20))
    // vocab_size is the running sum of n_new in bucket order
    var acc = 0L
    out.sortBy(_.getInt(0)).foreach { r =>
      acc += r.getLong(1)
      assert(r.getLong(2) == acc, s"cumulative mismatch at bucket ${r.getInt(0)}")
    }
    // total distinct 3-shingles recomputed directly
    val direct = graft.Tables.documents(spark, sf001)
      .select(explode(when(size(TextAnalysis.tokens(col("text"))) >= 3,
        expr("transform(sequence(1, size(split(lower(trim(text)), '\\\\s+'))-2), " +
          "i -> concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), i, 3)))"))
        .otherwise(expr("cast(array() as array<string>)"))).as("sh"))
      .agg(countDistinct(col("sh"))).collect()(0).getLong(0)
    assert(acc == direct)
  }

  test("incremental contamination: train re-offers read 1.0; held-out rows == literal tier") {
    val inc = TextQueries.qContaminationIncremental(spark, sf001).cache()
    // the re-offered train docs (ids shifted by IdOffset) leak fully:
    // every trigram of a train doc is in the index by construction
    val offset = graft.queries.DedupQueries.IdOffset
    val reoffered = inc.filter(col("doc_id") >= offset)
    assert(reoffered.count() > 0)
    assert(reoffered.filter(col("n_shingles") > 0
      && col("contamination_ratio") =!= 1.0).count() == 0,
      "a re-offered train doc must be fully contaminated")
    // the held-out (odd) half must match the from-scratch literal tier
    // row for row — state round-trip loses nothing
    val viaState = inc.filter(col("doc_id") < offset)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"))
    val fromScratch = TextQueries.qContamination(spark, sf001)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"))
    assert(viaState.exceptAll(fromScratch).count() == 0
      && fromScratch.exceptAll(viaState).count() == 0)
    inc.unpersist()
  }

  test("incremental heavy hitters: merged sketch φ-set == exact recount, delta term enters") {
    val out = TextQueries.qHeavyHittersIncremental(spark, sf001).cache()
    val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the planted delta-only term crosses the φ threshold only because
    // state-fold worked (history alone has zero occurrences of it)
    assert(got.contains("graftdelta"))
    // exact recount of history ∪ delta replays the φ cut
    val docs = graft.Tables.documents(spark, sf001).select(col("text"))
    val corpus = docs.unionByName(docs.select(
      concat(col("text"), lit(" graftdelta graftdelta graftdelta")).as("text")))
    val counts = corpus.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n")).cache()
    val total = counts.agg(sum(col("n"))).collect()(0).getLong(0)
    val exact = counts.filter(col("n") > total / 200.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, "sketch-merged φ-frequent set must equal the exact recount")
    counts.unpersist(); out.unpersist()
  }

  test("collocations: top-20 PMI rows match an in-memory recount of adjacency, margins, and totals") {
    val out = TextQueries.qCollocations(spark, sf001).collect()
    assert(out.length == 20)
    // independent single-threaded recount over the raw corpus
    val texts = graft.Tables.documents(spark, sf001)
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    var nTok = 0L; var nPair = 0L
    texts.foreach { t =>
      // the QUERY's tokenization: single-space split, no case folding,
      // empty tokens excluded from margins and severing their pairs
      val l = t.split(" ", -1)
      l.foreach { w => if (w.nonEmpty) { uni(w) = uni.getOrElse(w, 0L) + 1L; nTok += 1 } }
      l.sliding(2).filter(_.length == 2).foreach { p =>
        if (p(0).nonEmpty && p(1).nonEmpty) {
          val k = (p(0), p(1)); pair(k) = pair.getOrElse(k, 0L) + 1L; nPair += 1
        }
      }
    }
    def pmi(a: String, b: String): Double = {
      val nab = pair((a, b))
      BigDecimal(math.log(nab.toDouble * nTok * nTok /
        (nPair.toDouble * uni(a) * uni(b))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = pair.keys.toSeq.filter(k => pair(k) >= 5)
      .map { case (a, b) => (a, b, pair((a, b)), pmi(a, b)) }
      .sortBy { case (a, b, _, p) => (-p, a, b) }.take(20)
    val got = out.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // PMI ordering sanity: non-increasing down the emitted ranks
    assert(got.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("rater agreement: confusion and kappa recompute from raw rater verdicts") {
    val out = TextQueries.qRaterAgreement(spark, sf001).collect()
    val raw = graft.Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("n_chars"),
        org.apache.spark.sql.functions.col("text"))
      .collect()
      .map { r =>
        val ra = if (r.getLong(1) >= 250L) 1 else 0
        val t = r.getString(2).trim
        val rb = if (t.nonEmpty &&
          t.toLowerCase.split("\\s+").distinct.length >= 25) 1 else 0
        (r.getString(0), ra, rb)
      }.groupBy(_._1)
    assert(out.map(_.getString(0)).toSet == raw.keySet)
    out.foreach { r =>
      val rows = raw(r.getString(0))
      val Seq(n11, n10, n01, n00) =
        Seq((1, 1), (1, 0), (0, 1), (0, 0)).map { case (a, b) =>
          rows.count(x => x._2 == a && x._3 == b).toLong
        }
      assert(r.getLong(1) == rows.length.toLong)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((n11, n10, n01, n00)))
      val n = rows.length.toLong
      val peNum = BigInt(n11 + n10) * BigInt(n11 + n01) +
        BigInt(n01 + n00) * BigInt(n10 + n00)
      val po = (n11 + n00).toDouble / n
      val pe = peNum.toDouble / (n.toDouble * n)
      assert(math.abs(r.getDouble(6) - po) <= 1e-12)
      assert(math.abs(r.getDouble(7) - pe) <= 1e-12)
      val denom = BigInt(n) * BigInt(n) - peNum
      if (denom != 0) {
        val kappa = (BigInt(n) * BigInt(n11 + n00) - peNum).toDouble / denom.toDouble
        assert(math.abs(r.getDouble(8) - kappa) <= 1e-12)
        assert(r.getDouble(8) >= -1.0 - 1e-12 && r.getDouble(8) <= 1.0 + 1e-12)
      } else assert(r.isNullAt(8), "pe=1 source must emit NULL kappa")
    }
    // the harness corpus must actually exercise disagreement cells
    assert(out.exists(r => r.getLong(3) + r.getLong(4) > 0),
      "raters must disagree somewhere or kappa is vacuous")
  }

  test("readability: counts and flesch recompute exactly from the raw text") {
    val out = TextQueries.qReadability(spark, sf001).collect()
    val raw = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == raw.size)
    out.foreach { r =>
      val t = raw(r.getLong(0))
      val w = "\\S+".r.findAllIn(t).length
      val se = math.max(1, "[.!?]+".r.findAllIn(t).length)
      val sy = "[aeiouy]+".r.findAllIn(t.toLowerCase).length
      assert(r.getInt(1) == w && r.getInt(2) == se && r.getInt(3) == sy,
        s"doc ${r.getLong(0)} counts")
      if (w > 0) {
        val f = 206.835 - 1.015 * (w.toDouble / se) - 84.6 * (sy.toDouble / w)
        assert(r.getDouble(4) == f, s"doc ${r.getLong(0)}: ${r.getDouble(4)} vs $f")
      } else assert(r.isNullAt(4), "empty doc must emit NULL flesch")
    }
    // the harness corpus is unpunctuated: every doc is one sentence, so
    // the words/sentence term dominates — scores must still be finite
    assert(out.forall(r => r.isNullAt(4) || !r.getDouble(4).isNaN))
  }

  test("textrank keywords: top-20 matches a driver-side power iteration; mass conserved") {
    val out = TextQueries.qTextrankKeywords(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // rebuild the co-occurrence graph from the raw corpus
    val pairs = Tables.documents(spark, sf001)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val w = t.split(" ", -1)
        w.zip(w.drop(1)).filter { case (a, b) => a.length >= 4 && b.length >= 4 }
      }
    val wf = pairs.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 3).toSeq
    val edges = (wf.map { case ((a, b), n) => ((a, b), n) } ++
        wf.map { case ((a, b), n) => ((b, a), n) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(edges.nonEmpty, "fixture must produce a co-occurrence graph")
    val outW = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = edges.keysIterator.flatMap(k => Seq(k._1, k._2)).toSet.toSeq.sorted
    val n = nodes.size
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map.empty[String, Double]
      // accumulate per dst in sorted (src, dst) order — any order lands
      // within ulps; the comparison is at the rounded-9 grain
      edges.toSeq.sortBy(_._1).foreach { case ((s0, d0), w) =>
        in(d0) = in.getOrElse(d0, 0.0) + (w.toDouble / outW(s0)) * pr(s0)
      }
      pr = nodes.map(v => v -> ((1.0 - 0.85) / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    assert(math.abs(pr.values.sum - 1.0) < 1e-9,
      "symmetrized graph has no dangling nodes: rank mass must be conserved")
    val expected = pr.toSeq
      .map { case (w, s) => (w, BigDecimal(s)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (w, s) => (-s, w) }.take(20)
    assert(out.length == expected.length)
    out.zip(expected).foreach { case ((gw, gs), (ew, es)) =>
      assert(gw == ew && math.abs(gs - es) <= 2e-9, s"$gw=$gs vs $ew=$es")
    }
  }
}
