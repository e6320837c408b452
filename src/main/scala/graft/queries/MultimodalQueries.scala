package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column operators at the driver surface (rows-only checks:
  * the toy codec's byte-level behavior is not SQL-expressible; semantics
  * are covered by MultimodalSpec).
  */
object MultimodalQueries {

  private def media(s: SparkSession, d: String) =
    Multimodal.syntheticMedia(Tables.documents(s, d), "doc_id", "text")

  /** Binary decode → typed metadata over a synthetic media lake derived
    * deterministically from the documents table. */
  def qMultimodalDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeMeta(media(s, d)).toDF()
      .orderBy(col("media_id"))

  /** Binary feature extraction → fixed-width float vectors, unpacked to
    * one scalar column per dimension (f00..f15): the driver's rows-only
    * comparator sorts on column values, which an array column breaks. */
  def qMultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val dim = 16
    Multimodal.extractFeatures(media(s, d), dim = dim).toDF()
      .select(col("media_id") +: (0 until dim).map(i =>
        col("features").getItem(i).cast("double").as(f"f$i%02d")): _*)
      .orderBy(col("media_id"))
  }

  /** Video frame sampling: every 2nd frame exploded to its own row,
    * reported as scalar columns (length + crc32 of the re-encoded
    * frame) so the rows-only comparator sees a deterministic, sortable
    * shape. The explosion is partition-local (mapPartitions flatMap) —
    * no shuffle until the caller aggregates. */
  def qMultimodalFrames(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(media(s, d).filter(col("kind") === "video"), everyN = 2).toDF()
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"),
        crc32(col("frame_bytes")).as("frame_crc"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Image resize (nearest-neighbor, max-dim cap) then re-decode: the
    * output proves the resized payload stays decodable and within
    * bounds. Non-images pass through untouched. */
  def qMultimodalResize(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeMeta(Multimodal.resize(media(s, d), maxDim = 4)).toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("channels"), col("valid"))
      .orderBy(col("media_id"))

  /** The multimodal near-dup corpus: the synthetic lake ∪ verbatim
    * byte copies (+off — the exact-dup class every media pipeline
    * sees from re-uploads) ∪ locally-brightened perturbed copies
    * (+2·off — the re-encode/watermark class). */
  private def dedupMedia(s: SparkSession, d: String) = {
    val base = media(s, d)
    import s.implicits._
    base
      .union(base.map(m => m.copy(media_id = m.media_id + DedupQueries.IdOffset)))
      .union(Multimodal.perturbed(base, 2L * DedupQueries.IdOffset))
  }

  /** The registered Hamming verify threshold — ONE definition shared
    * by the query and its bounds gate (a drifting copy would make the
    * gate test a different operator than the one registered). */
  val DedupMaxHamming = 16

  /** Multimodal near-dedup: 64-bit aHash perceptual signatures →
    * banded candidate join → bit_count Hamming verify
    * ([[Multimodal.perceptualSignatures]]/[[Multimodal.signaturePairs]])
    * — image/audio/video dedup over opaque binary columns, the
    * modality sibling of the text MinHash/SimHash tiers. Rows-only
    * (byte-level codec work isn't SQL-expressible); recall and
    * false-pair invariants are the q_multimodal_dedup_bounds gate.
    *
    * Scale shape: signatures are one codec pass (mapPartitions, the
    * documented exemption); candidates shuffle only (id, band-key)
    * longs; the verify is a codegen'd XOR popcount on two longs —
    * the whole pair stage never touches media bytes. */
  def qMultimodalDedup(s: SparkSession, d: String): DataFrame =
    Multimodal.signaturePairs(
      Multimodal.perceptualSignatures(dedupMedia(s, d)).toDF(),
      maxHamming = DedupMaxHamming)
      .orderBy(col("id_a"), col("id_b"))

  /** Bounds gate for the perceptual-dedup tier: (a) every planted
    * VERBATIM copy pairs with its base at Hamming 0 — recall exactly
    * 1.0, guaranteed by banding (identical signatures share all
    * bands); (b) the locally-perturbed copies (strong edit on ~4 of
    * 64 grid cells) are recovered at ≥ 0.9 — measured 1.0 on the
    * harness lake (≤ 15 flipped bits leaves ≥ 1 of 4 16-bit bands
    * intact by pigeonhole whenever flips cluster, and the verify
    * threshold sits beyond the edit's bit damage), floor with
    * headroom for corpus drift; (c) every emitted pair's REPORTED
    * Hamming equals an independent recompute from the signatures
    * re-fetched by id, and none exceeds the registered
    * [[DedupMaxHamming]] — a differential check of the pair
    * plumbing's (sig_a, sig_b) carriage through the band join and
    * distinct (re-filtering the operator's own filtered output would
    * be vacuous); (d) a global brightness
    * shift is signature-INVARIANT (cells and mean move together) —
    * pinned in MultimodalSpec, not here, since it needs a custom
    * shift. Fail-closed on `lake_nonempty`. */
  def qMultimodalDedupBounds(s: SparkSession, d: String): DataFrame = {
    val off = DedupQueries.IdOffset
    val sigs = Multimodal.perceptualSignatures(dedupMedia(s, d)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = Multimodal.signaturePairs(sigs, maxHamming = DedupMaxHamming)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nBase = media(s, d).count()
        val exactFound = pairs
          .filter(col("id_b") === col("id_a") + off && col("id_a") < off &&
            col("hamming") === 0).count()
        val noisedFound = pairs
          .filter(col("id_b") === col("id_a") + 2L * off && col("id_a") < off)
          .count()
        // differential check of the pair PLUMBING: re-fetch each
        // side's signature BY ID and re-derive the distance — a
        // column mix-up or stale sig carried through the band join +
        // distinct flips this, where re-filtering the already-filtered
        // output would be vacuous (same expression, same verdict)
        val recomputeBad = pairs
          .join(sigs.select(col("media_id").as("id_a"), col("sig").as("ra")),
            Seq("id_a"))
          .join(sigs.select(col("media_id").as("id_b"), col("sig").as("rb")),
            Seq("id_b"))
          // compare and bound the RECOMPUTED distance — bounding the
          // reported column would re-test the operator's own filter
          .filter(expr("bit_count(ra ^ rb)").cast("int") =!= col("hamming") ||
            expr("bit_count(ra ^ rb)").cast("int") > DedupMaxHamming)
          .count()
        import s.implicits._
        Seq(("perceptual", nBase > 0, exactFound == nBase,
            nBase > 0 && noisedFound.toDouble / nBase >= 0.9,
            recomputeBad == 0L))
          .toDF("tier", "lake_nonempty", "exact_dups_all_found",
            "perturbed_recall_ok", "hamming_matches_recompute")
      } finally { pairs.unpersist(); () }
    } finally { sigs.unpersist(); () }
  }

  val qMultimodalDedupBoundsSql: String =
    // property-gate twin: literal expected frame, NOT a recomputation
    """SELECT * FROM (VALUES ('perceptual', true, true, true, true))
      |  t(tier, lake_nonempty, exact_dups_all_found,
      |    perturbed_recall_ok, hamming_matches_recompute)""".stripMargin

  /** The wide (production-scale) perceptual config, ONE definition
    * shared by query, bounds gate, and spec: 128-bit grid, 32-bit
    * band keys (4 bands), verify threshold scaled with the grid
    * (16/64 → 32/128). 32-bit keys keep expected per-key occupancy
    * O(1) past 2^16 rows — the saturation the narrow config's
    * scaladoc documents as its limit. */
  val WideGridBits = 128
  val WideBandBits = 32
  val WideMaxHamming = 32

  /** Multimodal near-dedup at the WIDE signature width — the
    * registered face of [[Multimodal.signaturePairsWide]]'s
    * beyond-2^16 scale path (the narrow q_multimodal_dedup stays the
    * harness-lake config). Rows-only like its sibling; the recall /
    * recompute / occupancy invariants are
    * q_multimodal_dedup_wide_bounds. */
  def qMultimodalDedupWide(s: SparkSession, d: String): DataFrame =
    Multimodal.signaturePairsWide(
      Multimodal.perceptualSignaturesN(dedupMedia(s, d), WideGridBits).toDF(),
      gridBits = WideGridBits, maxHamming = WideMaxHamming,
      bandBits = WideBandBits)
      .orderBy(col("id_a"), col("id_b"))

  /** Bounds gate for the wide tier — the narrow gate's contract at
    * 128 bits PLUS the occupancy bound the widening exists to buy:
    * (a) verbatim copies at Hamming 0, recall exactly 1.0 (pigeonhole
    * — identical signatures share all four 32-bit bands); (b) local
    * perturbation recovered at ≥ 0.9 (the edit damages the leading
    * cells' bands; the trailing bands stay intact); (c) every emitted
    * pair's reported Hamming equals an independent per-word XOR
    * popcount recompute from signatures re-fetched by id, none over
    * the registered threshold; (d) max per-(band, key) occupancy ≤ 12
    * — planted structure contributes 3 rows per content key (base +
    * copy + perturbed-with-intact-band) and 32-bit keys make random
    * collisions between content groups rare (measured max 3/·/9 at
    * sf0.001/0.01/0.1 — the planted triple plus birthday pile-ups),
    * so a dozen bounds every harness SF with headroom while
    * SATURATION — the failure mode this gate exists to catch, e.g.
    * the pre-fix degenerate threshold that parked ~30% of the lake on
    * one 0x5555… key — scales with N and blows through it
    * immediately. Fail-closed on `lake_nonempty`. */
  def qMultimodalDedupWideBounds(s: SparkSession, d: String): DataFrame = {
    val off = DedupQueries.IdOffset
    val sigs = Multimodal
      .perceptualSignaturesN(dedupMedia(s, d), WideGridBits).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = Multimodal.signaturePairsWide(sigs,
        gridBits = WideGridBits, maxHamming = WideMaxHamming,
        bandBits = WideBandBits)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nBase = media(s, d).count()
        val exactFound = pairs
          .filter(col("id_b") === col("id_a") + off && col("id_a") < off &&
            col("hamming") === 0).count()
        val noisedFound = pairs
          .filter(col("id_b") === col("id_a") + 2L * off && col("id_a") < off)
          .count()
        val words = WideGridBits / 64
        val recompute = (0 until words)
          .map(w => s"bit_count(ra[$w] ^ rb[$w])").mkString(" + ")
        val recomputeBad = pairs
          .join(sigs.select(col("media_id").as("id_a"), col("sig").as("ra")),
            Seq("id_a"))
          .join(sigs.select(col("media_id").as("id_b"), col("sig").as("rb")),
            Seq("id_b"))
          .filter(expr(recompute).cast("int") =!= col("hamming") ||
            expr(recompute).cast("int") > WideMaxHamming)
          .count()
        val occ = Multimodal.bandOccupancy(sigs, WideGridBits, WideBandBits)
          .agg(max(col("n")).as("mx")).head()
        val maxOcc = if (occ.isNullAt(0)) 0L else occ.getLong(0)
        import s.implicits._
        Seq(("perceptual_wide", nBase > 0, exactFound == nBase,
            nBase > 0 && noisedFound.toDouble / nBase >= 0.9,
            recomputeBad == 0L,
            maxOcc > 0L && maxOcc <= 12L))
          .toDF("tier", "lake_nonempty", "exact_dups_all_found",
            "perturbed_recall_ok", "hamming_matches_recompute",
            "occupancy_bounded")
      } finally { pairs.unpersist(); () }
    } finally { sigs.unpersist(); () }
  }

  val qMultimodalDedupWideBoundsSql: String =
    // property-gate twin: literal expected frame, NOT a recomputation
    """SELECT * FROM (VALUES ('perceptual_wide', true, true, true, true, true))
      |  t(tier, lake_nonempty, exact_dups_all_found,
      |    perturbed_recall_ok, hamming_matches_recompute,
      |    occupancy_bounded)""".stripMargin

  /** Oracle row for the multimodal tier — the property-gate contract
    * of the sketch-bounds family applied to the codec plumbing: the
    * synthetic media lake's invariants are analytic (every generated
    * blob decodes valid; payload length equals width·height·channels;
    * each kind's shape envelope — image 3-channel [8,16)², audio
    * 1×1×[64,128) samples, video 8×8 with 2-4 RGB frames), so one
    * aggregate over the decode output checks the ENTIRE mapPartitions
    * path — header parse, bounds checks, corrupt-row guard — and the
    * DuckDB twin is the literal all-true frame. The stub codec is the
    * documented swap point for real decoders; this gate is exactly
    * what survives the swap (a real lake asserts its own envelope). */
  def qMultimodalBounds(s: SparkSession, d: String): DataFrame = {
    val meta = Multimodal.decodeMeta(media(s, d)).toDF()
    val a = meta.agg(
      count(lit(1)).as("n"),
      sum(when(!col("valid"), 1L).otherwise(0L)).as("bad_valid"),
      sum(when(col("payload_len") =!=
        col("width") * col("height") * col("channels"), 1L).otherwise(0L)).as("bad_dims"),
      sum(when(col("kind") === "image" && !(col("channels") === 3
        && col("width").between(8, 15) && col("height").between(8, 15)),
        1L).otherwise(0L)).as("bad_image"),
      sum(when(col("kind") === "audio" && !(col("height") === 1
        && col("channels") === 1 && col("width").between(64, 127)),
        1L).otherwise(0L)).as("bad_audio"),
      sum(when(col("kind") === "video" && !(col("width") === 8
        && col("height") === 8 && col("channels").isin(6, 9, 12)),
        1L).otherwise(0L)).as("bad_video")).head()
    import s.implicits._
    Seq(("all_rows_decode_valid", a.getLong(0) > 0 && a.getLong(1) == 0L),
        ("audio_shape_envelope", a.getLong(4) == 0L),
        ("image_shape_envelope", a.getLong(3) == 0L),
        ("payload_matches_dims", a.getLong(2) == 0L),
        ("video_shape_envelope", a.getLong(5) == 0L))
      .toDF("check", "within_bounds")
      .orderBy(col("check"))
  }

  val qMultimodalBoundsSql: String =
    // property-gate twin: literal expected frame, NOT a recomputation
    """SELECT * FROM (VALUES ('all_rows_decode_valid', true),
      |  ('audio_shape_envelope', true), ('image_shape_envelope', true),
      |  ('payload_matches_dims', true), ('video_shape_envelope', true))
      |  t("check", within_bounds)
      |ORDER BY "check"""".stripMargin

  // ------------------------------------------------ Denylist screen
  /** The registry/corpus split for the denylist screen, shared by the
    * query and its bounds gate: media with id ≡ 5 (mod 13) form the
    * known-bad REGISTRY; the corpus is everything else PLUS a
    * perturbed (locally-brightened) copy of every registry item at
    * +IdOffset — the disguised re-upload the screen exists to catch. */
  private def denyRegistry(s: SparkSession, d: String) =
    media(s, d).filter(col("media_id") % 13 === 5)

  private def denyCorpus(s: SparkSession, d: String) = {
    val base = media(s, d)
    base.filter(col("media_id") % 13 =!= 5)
      .union(Multimodal.perturbed(denyRegistry(s, d), DedupQueries.IdOffset))
  }

  /** Perceptual-hash denylist screening
    * ([[graft.multimodal.Multimodal.denylistMatches]]): every corpus
    * item within Hamming ≤ 16 of a registry signature, with the
    * matched registry id — the known-bad-content gate (the
    * PhotoDNA-style screen) a media ingest runs BEFORE any other
    * processing. The registry side is broadcast; the corpus never
    * shuffles. Rows-only (the signature is codec-side mapPartitions
    * work, same adjudication as q_multimodal_dedup); gated fail-closed
    * by q_multimodal_denylist_bounds. */
  def qMultimodalDenylist(s: SparkSession, d: String): DataFrame =
    Multimodal.denylistMatches(
        Multimodal.perceptualSignatures(denyCorpus(s, d)).toDF(),
        Multimodal.perceptualSignatures(denyRegistry(s, d)).toDF(),
        maxHamming = DedupMaxHamming)
      .orderBy(col("media_id"), col("bad_id"), col("hamming"))

  /** Fail-closed gate for the denylist screen: (1) non-empty registry,
    * (2) planted disguised copies (+IdOffset perturbation of a
    * registry item) flagged against their own original at ≥ 0.9 —
    * the same measured perturbation-tolerance floor as the dedup
    * tier's `perturbed_recall_ok` (the local edit can flip > 15 grid
    * bits on unlucky media, so 1.0 is not the contract; measured
    * 1.0 at sf0.001 and 0.974 = 38/39 at sf0.01), (3) the
    * differential hamming recompute (re-fetch both signatures BY ID,
    * re-derive the distance — catches column mix-ups the operator's
    * own filter can't see), (4) the natural false-flag rate on the
    * clean lake bounded below 10% (hash-luck collisions near the
    * threshold exist by design; a BROKEN screen that flags everything
    * blows this bound, while planted-copy recall pins the other
    * direction). */
  def qMultimodalDenylistBounds(s: SparkSession, d: String): DataFrame = {
    val off = DedupQueries.IdOffset
    val regSigs = Multimodal.perceptualSignatures(denyRegistry(s, d)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpSigs = Multimodal.perceptualSignatures(denyCorpus(s, d)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val matches = Multimodal.denylistMatches(corpSigs, regSigs,
          maxHamming = DedupMaxHamming)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nReg = regSigs.count()
        val plantedFound = matches
          .filter(col("media_id") === col("bad_id") + off).count()
        val plantedRecallOk = nReg > 0 && plantedFound.toDouble / nReg >= 0.9
        val recomputeBad = matches
          .join(corpSigs.select(col("media_id"), col("sig").as("rc")),
            Seq("media_id"))
          .join(regSigs.select(col("media_id").as("bad_id"),
            col("sig").as("rr")), Seq("bad_id"))
          .filter(expr("bit_count(rc ^ rr)").cast("int") =!= col("hamming") ||
            expr("bit_count(rc ^ rr)").cast("int") > DedupMaxHamming)
          .count()
        // clean denominator = VALID original-id corpus rows only:
        // invalid signatures can never match (counting them loosened
        // the <10% bound), and planted copies (id >= off) that happen
        // to match a DIFFERENT registry item are plants, not clean
        // false flags (r17 ADVICE) — both sides now condition on
        // media_id < off. That id partition is an ASSUMPTION about the
        // lake, not a law: if original ids ever reach IdOffset, clean
        // rows would silently reclassify as plants and drop out of the
        // <10% denominator — so it fails loudly instead (r18 ADVICE).
        val maxOrigId = media(s, d)
          .agg(coalesce(max(col("media_id")), lit(-1L))).head().getLong(0)
        require(maxOrigId < off,
          s"denylist fixture id partition violated: max original media_id " +
            s"$maxOrigId >= IdOffset $off — raise IdOffset before trusting " +
            "the clean-false-flag denominator")
        val nClean = corpSigs
          .filter(col("valid") && col("media_id") < off).count()
        val cleanFlagged = matches
          .filter(col("media_id") < off)
          .select(col("media_id")).distinct().count()
        import s.implicits._
        Seq(("denylist", nReg > 0, plantedRecallOk,
            recomputeBad == 0L,
            nClean > 0 && cleanFlagged.toDouble / nClean < 0.10))
          .toDF("tier", "registry_nonempty", "planted_recall_ok",
            "hamming_matches_recompute", "clean_false_flag_rate_ok")
      } finally { matches.unpersist(); () }
    } finally { regSigs.unpersist(); corpSigs.unpersist(); () }
  }

  val qMultimodalDenylistBoundsSql: String =
    // property-gate twin: literal expected frame, NOT a recomputation
    """SELECT * FROM (VALUES ('denylist', true, true, true, true))
      |  t(tier, registry_nonempty, planted_recall_ok,
      |    hamming_matches_recompute, clean_false_flag_rate_ok)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_denylist" -> (qMultimodalDenylist _),
    "q_multimodal_denylist_bounds" -> (qMultimodalDenylistBounds _),
    "q_multimodal_dedup" -> (qMultimodalDedup _),
    "q_multimodal_dedup_bounds" -> (qMultimodalDedupBounds _),
    "q_multimodal_dedup_wide" -> (qMultimodalDedupWide _),
    "q_multimodal_dedup_wide_bounds" -> (qMultimodalDedupWideBounds _),
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_features" -> (qMultimodalFeatures _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_bounds" -> (qMultimodalBounds _))

  val oracles: Map[String, String] = Map(
    "q_multimodal_denylist_bounds" -> qMultimodalDenylistBoundsSql,
    "q_multimodal_dedup_bounds" -> qMultimodalDedupBoundsSql,
    "q_multimodal_dedup_wide_bounds" -> qMultimodalDedupWideBoundsSql,
    "q_multimodal_bounds" -> qMultimodalBoundsSql)
}
