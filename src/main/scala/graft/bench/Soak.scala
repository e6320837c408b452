package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables, TempDirs}

/** sf1 soak of the banded dedup tier — the off-paper check that the
  * candidate-generation math (LSH bands, PPJoin prefix filter)
  * actually collapsed the quadratic term: if any tier were secretly
  * all-pairs, a 10× corpus would cost ~100×, and the measured scaling
  * exponent log(t_S/t_1)/log(S) would read ≈2 instead of ≈1.
  *
  * The scaled corpus must preserve the sf0.1 corpus's STATISTICS for
  * the exponent to mean anything: S variants of the documents table at
  * disjoint id ranges, variant 0 verbatim and variant j ≥ 1 with a
  * per-variant letter suffixed to every token. Each variant keeps the
  * original's doc lengths, dup structure, and dup rate, while variant
  * vocabularies are disjoint — no shingle ever matches across
  * variants, so ground-truth pair counts scale exactly linearly (a
  * naive "10 verbatim copies" corpus would instead inflate every dup
  * cluster 10×, i.e. pair count ~45×, and measure a different
  * workload, not a bigger one).
  *
  *   SPARK_GRAFT_CPUS=16 scripts/run.sh graft.bench.Soak [maxScale]
  *
  * Prints one JSON line per query with per-scale wall times and the
  * fitted exponent; results are recorded in COVERAGE.md §soak.
  */
object Soak {

  // editdist exercises the Ed-Join gram-prefix + df-cap fallback tier
  // (its titles are doc_id-prefixed, so variant title sets are disjoint
  // and intra-variant pair structure is preserved exactly); simhash
  // exercises the banded-Hamming tier (variant-suffixed tokens give
  // disjoint shingle vocabularies, so signatures only collide
  // meaningfully within a variant).
  // NOTE: q_graph_triangles is deliberately NOT soaked — its planted
  // rotation edges couple every source through the global source index,
  // so scaling the corpus densifies the graph toward complete (the
  // ground-truth wedge volume is itself superlinear; a 1.4 measured
  // exponent says nothing about the operator). The orientation claim is
  // measured by graft.bench.WedgeProfile instead (hub-graph wedge
  // volume, lexicographic vs degree-oriented).
  val DefaultQueries = Seq("q_curation", "q_dedup_minhash", "q_dedup_ngram",
    "q_dedup_editdist", "q_dedup_simhash", "q_span_dedup",
    "q_interval_join", "q_span_provenance", "q_source_similarity")

  /** GRAFT_SOAK_AXIS=sources scales the SOURCE dimension along with
    * the corpus (variant j suffixes the source value as well as the
    * vocabulary) — the second axis the r14 verdict asked for on
    * q_source_similarity: under corpus-axis scaling the source
    * dictionary is constant and candidate volume must be linear in
    * distinct shingles; under source-axis scaling the C(|sources|,2)
    * dimension constant itself grows, which is exactly the regime
    * where the documented MinHash sketch tier takes over — the soak
    * measures how fast the exact tier degrades, not to prove it
    * doesn't. */
  def Axis: String = sys.env.getOrElse("GRAFT_SOAK_AXIS", "corpus")

  /** GRAFT_SOAK_QUERIES=q_a,q_b soaks a subset (dev iteration on one
    * tier without paying the full matrix). */
  def Queries: Seq[String] = sys.env.get("GRAFT_SOAK_QUERIES")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    .getOrElse(DefaultQueries)

  /** Variant id stride: far above every IdOffset-derived id the query
    * corpora synthesize (≤ 5 × IdOffset + base ids). PRIME, not a
    * power of ten (r9 fix): with stride 10^7, variant ids differed in
    * exactly ONE decimal digit, so the editdist soak's id-prefixed
    * titles formed genuine distance-1 pairs ACROSS variants — the
    * ground truth itself was quadratic in the scale factor and the
    * measured exponent said nothing about the operator. A prime
    * stride's carries spread the digit differences, keeping
    * cross-variant titles > maxDist apart and ground truth linear. */
  val VariantStride = 10000019L

  def scaledDocs(s: SparkSession, src: String, scale: Int): DataFrame = {
    val docs = Tables.documents(s, src)
    // stopwords keep their surface form: suffixing them would zero the
    // stopword-ratio quality signal and the quality gate would kill
    // every variant doc (measured: survivors stuck at 1x). Shingles
    // made ONLY of stopwords can still match across variants, but a
    // handful of shared shingles cannot reach the J >= 0.7 verify
    // threshold against disjoint content vocab — pair linearity holds
    // (counts mode proves it).
    val stop = graft.text.TextAnalysis.langProfiles.flatMap(_._2).distinct
    val stopArr = array(stop.map(lit): _*)
    (0 until scale).map { j =>
      if (j == 0) docs
      else {
        val suffix = ('a' + j).toChar.toString
        val v = docs.withColumn("doc_id", col("doc_id") + lit(j * VariantStride))
          .withColumn("text",
            concat_ws(" ", transform(split(col("text"), "\\s+"),
              t => when(array_contains(stopArr, lower(t)), t)
                .otherwise(concat(t, lit(suffix))))))
        if (Axis == "sources")
          v.withColumn("source", concat(col("source"), lit("_"), lit(j)))
        else v
      }
    }.reduce(_ unionByName _)
  }

  /** Scaled events for the interval-join soak — the TEMPORAL analog of
    * the disjoint-vocabulary trick: variant j shifts its month of
    * events 35·j days forward (≫ the 10-minute window), so incident
    * windows NEVER catch another variant's probes. Incidents × probes
    * both scale S× while per-window overlap density stays exactly the
    * sf0.1 distribution — output pairs and bucket cardinality scale
    * linearly, so the measured exponent reads the OPERATOR, not a
    * densifying workload (a same-span S× corpus would put S× probes
    * in every window: ground truth itself ~S², the q_graph_triangles
    * exclusion argument — solved here instead of excluded). */
  def scaledEvents(s: SparkSession, src: String, scale: Int): DataFrame = {
    val ev = Tables.events(s, src)
    (0 until scale).map { j =>
      if (j == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(j * VariantStride))
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${35 * j} DAYS"))
    }.reduce(_.unionByName(_))
  }

  /** GRAFT_SOAK_AXIS=dirty — the entity-resolution soak the r15
    * verdict asked for: the DIRTY side scales (each variant j a
    * DIFFERENT parametric typo of the whole dictionary, ids at
    * disjoint VariantStride offsets) while the clean dictionary stays
    * FIXED (the sf0.1 part-derived dict). Block volume is
    * Σ_b |dirty_b|·|clean_b| = scale × (day-1 volume), so the
    * expected exponent is ≤ 1; the probe line prints the block-skew
    * numbers behind that claim (max clean/dirty block, total
    * candidate volume) so a silent hot-prefix regression reads as a
    * super-linear band_vol, not just a slow wall clock. */
  private def erSoak(spark: SparkSession, scales: Seq[Int], src: String): Unit = {
    import org.apache.spark.sql.DataFrame
    val dict = graft.queries.ExtraQueries.entityDict(spark, src)
      .localCheckpoint(true)
    // one count for the broadcast size guard — resolve() per-call
    // recounts otherwise (r16 ADVICE)
    val nDict = Some(dict.count())
    def dirtyAt(scale: Int): DataFrame =
      (0 until scale).map { j =>
        val p = 6 + j % 5  // swap (p, p+1): prefix 1..5 always intact
        val q = 12 + j % 7 // drop char q (past the swap window)
        dict.select(
          (col("id") + lit(1000000L + j * VariantStride)).as("id"),
          concat(substring(col("name"), 1, p - 1),
            substring(col("name"), p + 1, 1), substring(col("name"), p, 1),
            substring(col("name"), p + 2, q - p - 2),
            substring(col("name"), q + 1, 1000000)).as("name"))
      }.reduce(_ unionByName _)
    val cleanBlk = dict
      .groupBy(lower(substring(col("name"), 1, 4)).as("blk"))
      .agg(count(lit(1)).as("cb")).localCheckpoint(true)
    // JIT warm-up on the 1x tier
    graft.ops.FuzzyJoin.resolve(dirtyAt(1), dict, 4, 0.9, dictRows = nDict)
      .write.format("noop").mode("overwrite").save()
    val times = scales.map { sc =>
      val dirty = dirtyAt(sc).localCheckpoint(true)
      val skew = dirty
        .groupBy(lower(substring(col("name"), 1, 4)).as("blk"))
        .agg(count(lit(1)).as("db"))
        .join(cleanBlk, Seq("blk"))
        .agg(sum(col("db") * col("cb")).as("vol"),
          max(col("db")).as("max_db"), max(col("cb")).as("max_cb")).head()
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.FuzzyJoin.resolve(dirty, dict, 4, 0.9, dictRows = nDict)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(s"[er-probe] scale=${sc}x block_vol=${skew.getLong(0)} " +
        s"max_dirty_block=${skew.getLong(1)} max_clean_block=${skew.getLong(2)}")
      spark.catalog.clearCache()
      sc -> t
    }
    val (s1, t1) = times.head
    val (sN, tN) = times.last
    val (sM, tM) = times(times.length - 2)
    val expTotal = math.log(tN / t1) / math.log(sN.toDouble / s1)
    val expMarginal = math.log(tN / tM) / math.log(sN.toDouble / sM)
    val ts = times.map { case (sc, t) => s""""${sc}x":${f"$t%.2f"}""" }.mkString(",")
    println(s"""{"query":"q_entity_resolution","axis":"dirty","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
  }

  /** GRAFT_SOAK_AXIS=eval — the fuzzy-decontamination soak the r16
    * verdict asked for: the EVAL batch scales (×1–30) against the
    * FIXED persisted sf0.1 train band index, the daily-eval-release
    * regime [[graft.queries.TextQueries.qContaminationFuzzyInc]]
    * models — train is never re-shingled, re-signed, or re-banded, so
    * only the eval side pays a scan and the expected exponent is ≤ 1.
    * Variant j ≥ 1 of the batch suffixes EVERY token (fully disjoint
    * vocabulary — variant shingles can't band-collide with train
    * beyond hash accidents), so true matches stay exactly 1× while
    * the banding cost scales: the exponent reads the SCREEN, not a
    * densifying workload. A band-occupancy probe per scale (total
    * eval×train collision volume, max bucket each side) makes a
    * silent hot-band regression read as super-linear band_vol, the
    * er-probe discipline. */
  private def fuzzyEvalSoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    val docs = Tables.documents(spark, src).select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val train = docs.filter(col("doc_id") % 2 === 0)
    // the FIXED artifact: one persisted band-index generation, built
    // once and only ever RELOADED inside the timed region
    val dir = TempDirs.create("graft_soak_fuzzyidx_").toString
    val (tb, tsets, handle) = graft.text.Dedup.minhashIndexWithHandle(train)
    tb.write.mode("overwrite").parquet(s"$dir/bands")
    tsets.write.mode("overwrite").parquet(s"$dir/sets")
    handle.unpersist()
    val batch1 = graft.queries.TextQueries
      .fuzzyEvalBatch(docs, 4, dropLast = true).localCheckpoint(true)
    def evalAt(scale: Int): DataFrame = scaledEvalBatch(batch1, scale)
    def screenOnce(ev: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val (eb, es) = graft.text.Dedup.minhashIndex(ev)
      graft.text.Dedup.crossMinhashPairs(eb, es,
          spark.read.parquet(s"$dir/bands"),
          spark.read.parquet(s"$dir/sets"), maxJaccardDist = 0.3)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    screenOnce(evalAt(1)) // JIT/classloader warm-up
    val tbAgg = spark.read.parquet(s"$dir/bands")
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("tc"))
      .localCheckpoint(true)
    val times = scales.map { sc =>
      val ev = evalAt(sc).localCheckpoint(true)
      val (eb, _) = graft.text.Dedup.minhashIndex(ev)
      val probe = eb.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("ec"))
        .join(tbAgg, Seq("band", "key"))
        .agg(coalesce(sum(col("ec") * col("tc")), lit(0L)).as("vol"),
          coalesce(max(col("ec")), lit(0L)).as("max_ec"),
          coalesce(max(col("tc")), lit(0L)).as("max_tc")).head()
      spark.catalog.clearCache()
      val t = (1 to 2).map(_ => screenOnce(ev)).min
      println(s"[fuzzy-probe] scale=${sc}x band_vol=${probe.getLong(0)} " +
        s"max_eval_bucket=${probe.getLong(1)} max_train_bucket=${probe.getLong(2)}")
      sc -> t
    }
    val (s1, t1) = times.head
    val (sN, tN) = times.last
    val (sM, tM) = times(times.length - 2)
    val expTotal = math.log(tN / t1) / math.log(sN.toDouble / s1)
    val expMarginal = math.log(tN / tM) / math.log(sN.toDouble / sM)
    val ts = times.map { case (sc, t) => s""""${sc}x":${f"$t%.2f"}""" }.mkString(",")
    println(s"""{"query":"q_contamination_fuzzy_inc","axis":"eval","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
  }

  /** GRAFT_SOAK_AXIS=patterns — the blocklist K-axis: corpus FIXED at
    * sf0.1, pattern count scaled K = 8·scale (8 → 240). The claim
    * under test is the tier split itself: the codegen tier is
    * O(K · |text|) per row (one substring scan per phrase) and must
    * read exponent ≈ 1 in K, while the Aho–Corasick tier is
    * O(|text| + matches) and must read ≈ 0 — the flat line is WHY the
    * automaton tier exists. Phrases are 2-word combos of the harness
    * vocabulary, so hit rates stay realistic as K grows. */
  private def blocklistSoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    val docs = Tables.documents(spark, src)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "the", "line", "sort", "window", "merge",
      "batch", "spark", "order", "data", "column", "join", "small",
      "customer", "query", "big", "stream", "group", "vector", "filter", "a")
    def phrasesAt(k: Int): Seq[String] =
      (for { a <- vocab; b <- vocab } yield s"$a $b").take(k)
    def once(k: Int, ac: Boolean): Double = {
      val ps = phrasesAt(k)
      val t0 = System.nanoTime()
      val out =
        if (ac) graft.text.Blocklist.screenAc(docs, "doc_id", "text", ps)
        else graft.text.Blocklist.screen(docs, "doc_id", "text", ps)
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(8, ac = false); once(8, ac = true) // JIT/codegen warm-up
    Seq(("q_blocklist_filter", false), ("q_blocklist_ac", true)).foreach {
      case (name, ac) =>
        val times = scales.map { sc =>
          val k = 8 * sc
          k -> (1 to 2).map(_ => once(k, ac)).min
        }
        val (k1, t1) = times.head
        val (kN, tN) = times.last
        val (kM, tM) = times(times.length - 2)
        val expTotal = math.log(tN / t1) / math.log(kN.toDouble / k1)
        val expMarginal = math.log(tN / tM) / math.log(kN.toDouble / kM)
        val ts = times.map { case (k, t) => s""""k$k":${f"$t%.2f"}""" }.mkString(",")
        println(s"""{"query":"$name","axis":"patterns","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
    }
  }

  /** Variant-scaled copy of an eval batch: variant j ≥ 1 at a disjoint
    * [[VariantStride]] id offset with EVERY token suffixed by ('a'+j) —
    * fully disjoint vocabulary, so scaled batches cannot produce new
    * true matches against the fixed train artifact. Shared by both
    * eval-axis soaks (fuzzy and containment) so the variant geometry
    * cannot silently diverge between them. */
  private def scaledEvalBatch(batch1: DataFrame, scale: Int): DataFrame =
    (0 until scale).map { j =>
      if (j == 0) batch1
      else {
        val suffix = ('a' + j).toChar.toString
        batch1
          .withColumn("doc_id", col("doc_id") + lit(j * VariantStride))
          .withColumn("text", concat_ws(" ",
            transform(split(col("text"), "\\s+"),
              t => concat(t, lit(suffix)))))
      }
    }.reduce(_ unionByName _)

  /** GRAFT_SOAK_AXIS=evalc — the containment-decontamination analog
    * of the fuzzy EVAL soak: the eval batch scales 1–30× against the
    * FIXED parquet-persisted train shingle frame
    * ([[graft.queries.TextQueries.qContaminationContainmentInc]]'s
    * regime — the 100 TB train side is shingled once, never again).
    * Variant j ≥ 1 suffixes EVERY token, so variant shingles cannot
    * equi-join-collide with train (literal-string keys, fully disjoint
    * vocabulary): true matches stay exactly 1× while the probe cost
    * scales — the exponent reads the SCREEN. A shingle-occupancy probe
    * per scale (eval×train key collision volume, max key each side)
    * surfaces a hot-shingle regression as super-linear key_vol. */
  private def containEvalSoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    val docs = Tables.documents(spark, src).select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val dir = TempDirs.create("graft_soak_containidx_").toString
    graft.text.Dedup.literalShingleFrame(train, 3, "train_id")
      .write.mode("overwrite").parquet(dir)
    val batch1 = graft.queries.TextQueries
      .containmentEvalBatch(docs, offsetMult = 7, sliceStart = 6)
      .localCheckpoint(true)
    def evalAt(scale: Int): DataFrame = scaledEvalBatch(batch1, scale)
    def screenOnce(ev: DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.text.Dedup.containmentPairsFromIndex(ev,
          spark.read.parquet(dir))
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    screenOnce(evalAt(1)) // JIT/codegen warm-up
    val trAgg = spark.read.parquet(dir)
      .groupBy(col("sh")).agg(count(lit(1)).as("tc"))
      .localCheckpoint(true)
    val times = scales.map { sc =>
      val ev = evalAt(sc).localCheckpoint(true)
      val probe = graft.text.Dedup.literalShingleFrame(ev, 3, "eval_id")
        .groupBy(col("sh")).agg(count(lit(1)).as("ec"))
        .join(trAgg, Seq("sh"))
        .agg(coalesce(sum(col("ec") * col("tc")), lit(0L)).as("vol"),
          coalesce(max(col("ec")), lit(0L)).as("max_ec"),
          coalesce(max(col("tc")), lit(0L)).as("max_tc")).head()
      spark.catalog.clearCache()
      val t = (1 to 2).map(_ => screenOnce(ev)).min
      println(s"[containment-probe] scale=${sc}x key_vol=${probe.getLong(0)} " +
        s"max_eval_key=${probe.getLong(1)} max_train_key=${probe.getLong(2)}")
      sc -> t
    }
    val (s1, t1) = times.head
    val (sN, tN) = times.last
    val (sM, tM) = times(times.length - 2)
    val expTotal = math.log(tN / t1) / math.log(sN.toDouble / s1)
    val expMarginal = math.log(tN / tM) / math.log(sN.toDouble / sM)
    val ts = times.map { case (sc, t) => s""""${sc}x":${f"$t%.2f"}""" }.mkString(",")
    println(s"""{"query":"q_contamination_containment_inc","axis":"evalc","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
  }

  /** GRAFT_SOAK_AXIS=registry — the media-denylist K-axis the r17
    * verdict asked for: corpus signatures FIXED (the sf0.1 synthetic
    * media lake, signatures precomputed outside the timed region),
    * known-bad registry scaled K = 80·scale (80 → 2 400 synthetic
    * 64-bit signatures). The claim under test is the broadcast banded
    * probe's shape: corpus banding cost is K-independent and the
    * probe is a broadcast-map lookup, so the exponent in K should
    * read near-flat (candidate volume grows only as K/2¹⁶ per band —
    * the hash-luck collision constant). A band-occupancy probe per
    * scale (corpus×registry collision volume, max bucket each side)
    * makes a silent hot-band regression read as super-linear
    * band_vol, the er-probe discipline. */
  private def registrySoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    import graft.multimodal.Multimodal
    val corpSigs = Multimodal.perceptualSignatures(
        Multimodal.syntheticMedia(Tables.documents(spark, src), "doc_id", "text"))
      .toDF().localCheckpoint(true)
    def registryAt(k: Int): DataFrame = spark.range(k)
      .select((col("id") + 1000000000L).as("media_id"),
        lit("image").as("kind"), xxhash64(col("id")).as("sig"),
        lit(true).as("valid"))
    def once(k: Int): Double = {
      val t0 = System.nanoTime()
      Multimodal.denylistMatches(corpSigs, registryAt(k), maxHamming = 16)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(80) // JIT/codegen warm-up
    val corpBands = corpSigs.filter(col("valid"))
      .select(col("sig"), posexplode(array((0 until 4).map(b =>
        expr(s"shiftright(sig, ${b * 16}) & 65535")): _*))
        .as(Seq("band", "key")))
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("cc"))
      .localCheckpoint(true)
    val times = scales.map { sc =>
      val k = 80 * sc
      val probe = registryAt(k)
        .select(posexplode(array((0 until 4).map(b =>
          expr(s"shiftright(sig, ${b * 16}) & 65535")): _*))
          .as(Seq("band", "key")))
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("rc"))
        .join(corpBands, Seq("band", "key"))
        .agg(coalesce(sum(col("rc") * col("cc")), lit(0L)).as("vol"),
          coalesce(max(col("rc")), lit(0L)).as("max_reg"),
          coalesce(max(col("cc")), lit(0L)).as("max_corp")).head()
      println(s"[registry-probe] k=$k band_vol=${probe.getLong(0)} " +
        s"max_registry_bucket=${probe.getLong(1)} max_corpus_bucket=${probe.getLong(2)}")
      k -> (1 to 2).map(_ => once(k)).min
    }
    val (k1, t1) = times.head
    val (kN, tN) = times.last
    val (kM, tM) = times(times.length - 2)
    val expTotal = math.log(tN / t1) / math.log(kN.toDouble / k1)
    val expMarginal = math.log(tN / tM) / math.log(kN.toDouble / kM)
    val ts = times.map { case (k, t) => s""""k$k":${f"$t%.2f"}""" }.mkString(",")
    println(s"""{"query":"q_multimodal_denylist","axis":"registry","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
  }

  /** GRAFT_SOAK_AXIS=vocab — the distributed BPE merge loop
    * (maxDriverWords = 0 forces the frame path; the hybrid's collect
    * branch never runs) against a SYNTHETIC vocabulary scaled 1–30×:
    * 20 000·scale distinct base-36 words from the MINSTD LCG (injective
    * below 2³¹−1, so distinct-word count scales exactly linearly while
    * word length and character statistics stay fixed). The harness
    * corpus itself cannot drive this axis — its synthetic vocabulary is
    * ~30 distinct words, so every scale would measure only fixed
    * overhead. Merge budget frozen at 16. Each round is one
    * explode+partial-agg over the vocab frame + a 1-row argmax pull +
    * a codegen'd fold rewrite, so the expected exponent in vocab size
    * is ≤ 1; the probe line prints the measured vocab sizes behind the
    * claim. */
  private def bpeVocabSoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    def docsAt(sc: Int): DataFrame =
      spark.range(20000L * sc)
        .select(col("id").as("doc_id"),
          conv(((col("id") * 48271L + 11L) % 2147483647L).cast("string"),
            10, 36).as("text"))
        .localCheckpoint(true)
    def once(docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val merges = graft.text.Bpe.learnMerges(docs, numMerges = 16,
        maxDriverWords = 0L)
      require(merges.length == 16, s"merge loop exhausted at ${merges.length}")
      (System.nanoTime() - t0) / 1e9
    }
    once(docsAt(1)) // JIT/classloader warm-up
    val times = scales.map { sc =>
      val docs = docsAt(sc)
      val vocab = docs.select(col("text")).distinct().count()
      println(s"[vocab-probe] scale=${sc}x distinct_words=$vocab")
      val t = (1 to 2).map(_ => once(docs)).min
      spark.catalog.clearCache()
      sc -> t
    }
    val (s1, t1) = times.head
    val (sN, tN) = times.last
    val (sM, tM) = times(times.length - 2)
    val expTotal = math.log(tN / t1) / math.log(sN.toDouble / s1)
    val expMarginal = math.log(tN / tM) / math.log(sN.toDouble / sM)
    val ts = times.map { case (sc, t) => s""""${sc}x":${f"$t%.2f"}""" }.mkString(",")
    println(s"""{"query":"q_bpe_train","axis":"vocab","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
  }

  /** GRAFT_SOAK_AXIS=hotdf — the containment df-cap axis (r18 verdict
    * directive 1): corpus and eval batch FIXED at sf0.1, the HEADER
    * DOCUMENT FREQUENCY scaled — a shared 10-token header is injected
    * into sc/32 of the train docs (≈ 3% → 94%), and every 8th eval doc
    * carries the same header. The cap is FIXED at n_train/64, so the
    * header shingles are hot at every scale while no natural shingle
    * is (sf0.1 natural max df ≈ 0.7% of train). The claim under test
    * is the cap's structural bound: the UNCAPPED screen's candidate
    * volume grows linearly with header df (every headered eval doc
    * joins every headered train doc through the 8 header trigrams),
    * while the CAPPED screen's volume is df-INDEPENDENT — the volume
    * probe prints both so the flat line is measured, not asserted. */
  private def hotDfSoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    import graft.text.Dedup
    val header = graft.queries.TextQueries.HotHeader
    val docs = Tables.documents(spark, src)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val evalFixed = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        when(col("doc_id") % 16 === 1,
          concat(lit(header + " "), col("text")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint(true)
    val trainBase = docs.filter(col("doc_id") % 2 === 0)
    val nTrain = trainBase.count()
    val cap = math.max(1L, nTrain / 64L)
    def trainAt(sc: Int): DataFrame = trainBase
      .select(col("doc_id"),
        when(expr("(doc_id div 2) % 32") < sc,
          concat(lit(header + " "), col("text")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint(true)
    def once(train: DataFrame, capped: Boolean): Double = {
      val t0 = System.nanoTime()
      val out =
        if (capped) Dedup.containmentPairsFromCappedIndex(evalFixed,
          Dedup.dfCapShingleFrame(
            Dedup.literalShingleFrame(train, 3, "train_id"), cap))
        else Dedup.containmentPairs(evalFixed, train)
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(trainAt(1), capped = true); once(trainAt(1), capped = false) // warm-up
    // one headered train frame per SCALE, shared by both tiers (the
    // r19 self-review: the per-(tier, scale) layout retained twice the
    // checkpoint blocks and measured the tiers in different windows);
    // per-scale clearCache releases the dedup internals between legs
    val tiers = Seq(("q_contamination_capped", true),
      ("q_contamination_containment", false))
    val acc = tiers.map { case (name, capped) =>
      (name, capped) -> scala.collection.mutable.ListBuffer.empty[(Int, Double)]
    }.toMap
    scales.foreach { sc =>
      val train = trainAt(sc)
      val trainSh = Dedup.literalShingleFrame(train, 3, "train_id")
        .localCheckpoint(true)
      val evSh = Dedup.literalShingleFrame(evalFixed, 3, "eval_id")
        .localCheckpoint(true)
      tiers.foreach { case (name, capped) =>
        // candidate-volume probe: the (eval shingle × train doc) join
        // rows the rollup shuffles — the quantity the cap bounds
        val vol =
          if (capped) {
            val idx = Dedup.dfCapShingleFrame(trainSh, cap)
            evSh.join(broadcast(idx.hot.select(col("sh"))), Seq("sh"), "left_anti")
              .join(idx.kept, Seq("sh")).count()
          } else evSh.join(trainSh, Seq("sh")).count()
        println(s"[hotdf-probe] tier=$name scale=${sc}x cand_vol=$vol")
        acc((name, capped)) += sc -> (1 to 2).map(_ => once(train, capped)).min
      }
      spark.catalog.clearCache()
    }
    tiers.foreach { case (name, capped) =>
      val times = acc((name, capped)).toList
      val (s1, t1) = times.head
      val (sN, tN) = times.last
      val (sM, tM) = times(times.length - 2)
      val expTotal = math.log(tN / t1) / math.log(sN.toDouble / s1)
      val expMarginal = math.log(tN / tM) / math.log(sN.toDouble / sM)
      val ts = times.map { case (sc, t) => s""""${sc}x":${f"$t%.2f"}""" }.mkString(",")
      println(s"""{"query":"$name","axis":"hotdf","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
    }
  }

  /** GRAFT_SOAK_AXIS=paras — the PARAGRAPHS-PER-DOC axis for the
    * paragraph dedup tier (r18 verdict directive 6): corpus BYTES
    * ~fixed at sf0.1, each document re-chunked into p = 2·scale
    * newline-delimited paragraphs (2 → 60), so the paragraph-frame row
    * count scales with p while total text does not. Every natural
    * chunk gets ONE doc-and-ordinal-unique suffix token — without it,
    * re-chunking a tiny-vocabulary corpus into 1–2-token paragraphs
    * manufactures corpus-sized identical-paragraph cliques whose TRUE
    * pair volume is quadratic (the first draft of this soak measured
    * exactly that blow-up at p = 60: ground truth itself explodes, so
    * the wall time says nothing about the operator). With unique
    * suffixes the only cross-doc duplicates are the PLANTED group
    * boilerplate (the paraCorpus geometry, one per doc), so ground
    * truth is p-CONSTANT and the measured cost is the fan-out
    * dimension alone — the dimension the uid packing bounds at
    * [[graft.text.Dedup]] ParasPerDoc = 1024. The probe prints
    * paragraph counts and band occupancy at paragraph grain, so a hot
    * band reads directly rather than hiding inside the wall time. */
  private def paragraphSoak(spark: SparkSession, scales: Seq[Int],
      src: String): Unit = {
    import graft.text.Dedup
    val docs = Tables.documents(spark, src)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val boiler = docs.filter(col("doc_id") % 4 === 0)
      .select(expr("doc_id div 4").as("g"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 48)).as("boiler"))
      .localCheckpoint(true)
    def rechunked(p: Int): DataFrame = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), array_join(
        // the unique suffix token also means no chunk is ever blank,
        // so paragraph rows are exactly docs × p (+ planted boiler)
        expr(s"""transform(sequence(0, ${p - 1}), i ->
           | concat_ws(' ', slice(toks,
           |   cast(i * size(toks) / $p as int) + 1,
           |   cast((i+1) * size(toks) / $p as int)
           |     - cast(i * size(toks) / $p as int))
           |   || array(concat('u', doc_id, 'x', i))))""".stripMargin
          .replace("\n", " ")),
        "\n").as("text"))
      .withColumn("g", expr("doc_id div 4"))
      .join(boiler, Seq("g"), "left")
      .select(col("doc_id"),
        when(col("boiler").isNotNull && length(col("boiler")) > 0,
          concat(col("text"), lit("\n"), col("boiler")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint(true)
    def once(corpus: DataFrame): Double = {
      val t0 = System.nanoTime()
      Dedup.paragraphDupStats(corpus)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    once(rechunked(2)) // warm-up
    val times = scales.map { sc =>
      val p = 2 * sc
      val corpus = rechunked(p)
      val paras = Dedup.paragraphFrame(corpus)
      val (bands, _) = Dedup.minhashIndex(paras, textCol = "para", idCol = "uid")
      val occ = bands.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(max(col("c")), lit(0L)).as("max_bucket"),
          coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("cand_pairs"))
        .head()
      println(s"[paras-probe] p=$p n_paragraphs=${paras.count()} " +
        s"max_band_bucket=${occ.getLong(0)} band_cand_pairs=${occ.getLong(1)}")
      spark.catalog.clearCache()
      p -> (1 to 2).map(_ => once(corpus)).min
    }
    val (p1, t1) = times.head
    val (pN, tN) = times.last
    val (pM, tM) = times(times.length - 2)
    val expTotal = math.log(tN / t1) / math.log(pN.toDouble / p1)
    val expMarginal = math.log(tN / tM) / math.log(pN.toDouble / pM)
    val ts = times.map { case (p, t) => s""""p$p":${f"$t%.2f"}""" }.mkString(",")
    println(s"""{"query":"q_dedup_paragraphs","axis":"paras","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,3,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (Axis == "dirty") {
      erSoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "eval") {
      fuzzyEvalSoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "patterns") {
      blocklistSoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "registry") {
      registrySoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "evalc") {
      containEvalSoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "vocab") {
      bpeVocabSoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "hotdf") {
      hotDfSoak(spark, scales, src)
      spark.stop()
      return
    }
    if (Axis == "paras") {
      paragraphSoak(spark, scales, src)
      spark.stop()
      return
    }

    // one dir per scale: documents.parquet (dedup tiers) +
    // events.parquet (interval join — written only when a soaked
    // query reads it, so GRAFT_SOAK_QUERIES=dedup-only runs don't pay
    // the 30× events build)
    val needsEvents = Queries.contains("q_interval_join")
    val dirs: Map[Int, String] = scales.map { sc =>
      val dir = TempDirs.create(s"graft_soak_${sc}x_").toString
      scaledDocs(spark, src, sc)
        .repartition(math.max(4, sc * 4))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      if (needsEvents)
        scaledEvents(spark, src, sc)
          .repartition(math.max(4, sc * 4))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      sc -> dir
    }.toMap

    def execOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }

    // `counts` mode: print output row counts per scale instead of
    // timing — the linearity sanity check behind the exponent claim
    // (a silently-truncating tier would also time sub-linear)
    if (args.contains("counts")) {
      scales.foreach { sc =>
        val cs = Queries.map(q =>
          s"$q=${SparkEntry.queries(q)(spark, dirs(sc)).count()}")
        spark.catalog.clearCache()
        println(s"""[soak-counts] scale=${sc}x ${cs.mkString(" ")}""")
      }
      spark.stop()
      return
    }

    // JIT/classloader warm-up on the small tier so per-scale times
    // measure the engine
    Queries.foreach(q => execOnce(q, "/root/testdata/sf0.01"))

    // min of 2 runs per point: at these absolute sizes (seconds) a
    // single run's scheduler noise can swamp the 3x−1x delta
    Queries.foreach { q =>
      val times = scales.map(sc =>
        sc -> (1 to 2).map(_ => execOnce(q, dirs(sc))).min)
      val (s1, t1) = times.head
      val (sN, tN) = times.last
      val (sM, tM) = times(times.length - 2)
      // exp_total folds the per-job fixed overhead in (reads LOW at
      // small absolute times); exp_marginal between the two largest
      // scales is the scale-sensitive signal — a quadratic tier would
      // read ≈2 on both
      val expTotal = math.log(tN / t1) / math.log(sN.toDouble / s1)
      val expMarginal = math.log(tN / tM) / math.log(sN.toDouble / sM)
      val ts = times.map { case (sc, t) => s""""${sc}x":${f"$t%.2f"}""" }.mkString(",")
      println(s"""{"query":"$q","times":{$ts},"exp_total":${f"$expTotal%.3f"},"exp_marginal":${f"$expMarginal%.3f"}}""")
    }
    spark.stop()
  }
}
