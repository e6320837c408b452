package graft.multimodal

import java.nio.ByteBuffer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata, with
  * decode / feature-extraction / resize / frame-sampling operators.
  *
  * The container has no real image/audio codecs (SURVEY north star:
  * stub the decode, make the Spark side real), so decode targets a
  * deterministic toy container format "GRF1":
  *
  *   bytes 0–3   magic "GRF1"
  *   bytes 4–7   width  (big-endian int)
  *   bytes 8–11  height (big-endian int)
  *   bytes 12–15 channels
  *   bytes 16–   payload (width*height*channels bytes, row-major)
  *
  * Swapping in a real codec (JPEG via javax.imageio, audio via a
  * PCM reader) changes ONLY [[MediaCodec.decode]] — schema, batch
  * shape, partitioning and operator signatures stay as tested here.
  *
  * Execution model: binary decode is genuine per-partition imperative
  * work — the documented last-resort case for `mapPartitions`
  * (SURVEY §7; the JVM analogue of the reference ecosystem's
  * `mapInPandas` batches). Each partition's rows stream through the
  * decoder one batch at a time; nothing is collected to the driver.
  * Partitioning: repartition on `media_id` upstream if decode cost is
  * skewed by media size.
  */
object Multimodal {

  val Magic: Array[Byte] = "GRF1".getBytes("US-ASCII")

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class DecodedMeta(media_id: Long, kind: String, width: Int,
      height: Int, channels: Int, payload_len: Int, valid: Boolean)
  final case class MediaFeatures(media_id: Long, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** The stubbed codec. Real-codec swap point. */
  object MediaCodec {
    def encode(width: Int, height: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length == width * height * channels)
      val buf = ByteBuffer.allocate(16 + payload.length)
      buf.put(Magic).putInt(width).putInt(height).putInt(channels).put(payload)
      buf.array()
    }

    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 16) return None
      if (!bytes.take(4).sameElements(Magic)) return None
      val buf = ByteBuffer.wrap(bytes, 4, 12)
      val (w, h, c) = (buf.getInt, buf.getInt, buf.getInt)
      if (w <= 0 || h <= 0 || c <= 0 || bytes.length != 16 + w * h * c) None
      else Some((w, h, c, bytes.drop(16)))
    }
  }

  /** Deterministic synthetic media table derived from any (id, seed
    * string) pairs — stands in for a real media lake. */
  def syntheticMedia(df: DataFrame, idCol: String, seedCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(seedCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, seed) =>
        val rnd = new scala.util.Random(id * 2654435761L + seed.hashCode)
        val kind = Seq("image", "audio", "video")(math.floorMod(id, 3).toInt)
        val (w, h, c) = kind match {
          case "image" => (8 + rnd.nextInt(8), 8 + rnd.nextInt(8), 3)
          case "audio" => (64 + rnd.nextInt(64), 1, 1)      // samples × 1
          case _       => (8, 8, 3 * (2 + rnd.nextInt(3)))  // 8×8, n frames × 3
        }
        val payload = new Array[Byte](w * h * c)
        rnd.nextBytes(payload)
        MediaRow(id, kind, MediaCodec.encode(w, h, c, payload))
      }
  }

  /** Decode → typed metadata. Corrupt/truncated media yields
    * `valid = false` rows rather than task failures (at 100 TB some
    * inputs are always corrupt; a poison row must not kill the job). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      MediaCodec.decode(m.bytes) match {
        case Some((w, h, c, p)) => DecodedMeta(m.media_id, m.kind, w, h, c, p.length, valid = true)
        case None => DecodedMeta(m.media_id, m.kind, 0, 0, 0, 0, valid = false)
      }
    })
  }

  /** Feature extraction: payload → fixed-width Float vector.
    * Stub featurizer = per-bucket byte histograms (deterministic);
    * a real model would run here with the same signature and batch
    * shape (iterator-of-rows per partition). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      MediaCodec.decode(m.bytes).map { case (_, _, _, payload) =>
        val hist = new Array[Float](dim)
        payload.foreach { b => hist(math.floorMod(b.toInt, dim)) += 1f }
        val n = math.max(1, payload.length)
        MediaFeatures(m.media_id, hist.map(_ / n))
      }
    })
  }

  /** Resize an image to fit within maxDim (payload re-sampled by
    * nearest-neighbor on the toy format). Non-images pass through. */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else MediaCodec.decode(m.bytes) match {
        case Some((w, h, c, p)) if math.max(w, h) > maxDim =>
          val scale = maxDim.toDouble / math.max(w, h)
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val out = new Array[Byte](nw * nh * c)
          for (y <- 0 until nh; x <- 0 until nw; ch <- 0 until c) {
            val sx = math.min(w - 1, (x / scale).toInt)
            val sy = math.min(h - 1, (y / scale).toInt)
            out((y * nw + x) * c + ch) = p((sy * w + sx) * c + ch)
          }
          m.copy(bytes = MediaCodec.encode(nw, nh, c, out))
        case _ => m
      }
    })
  }

  final case class MediaSig(media_id: Long, kind: String, sig: Long, valid: Boolean)

  /** 64-bit average-hash perceptual signature (aHash — the classical
    * pHash-family baseline): the decoded payload collapses to a
    * 64-cell luminance grid (channels averaged, cells spanning equal
    * pixel runs), each cell thresholded against the grid mean → one
    * bit. Perceptually-similar media (re-encodes, small edits,
    * brightness shifts — a GLOBAL shift moves every cell AND the mean
    * together, so the signature is exactly invariant to it) land
    * within a small Hamming distance; unrelated media sit near 32.
    * The codec-side half of multimodal near-dedup — per-partition
    * imperative work like [[decodeMeta]] (the documented mapPartitions
    * exemption); the banded matching over the resulting longs is pure
    * DataFrame ([[signaturePairs]]). Corrupt media → `valid = false`,
    * never a task failure. Swapping a real decoder changes only the
    * pixel source; grid, threshold, and banding survive. */
  def perceptualSignatures(media: Dataset[MediaRow]): Dataset[MediaSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    perceptualSignaturesN(media, 64)
      .map(sn => MediaSig(sn.media_id, sn.kind, sn.sig.head, sn.valid))
  }

  /** Width-parameterized signature: `gridBits / 64` little-endian
    * words, word 0 bit 0 = cell 0. */
  final case class MediaSigN(media_id: Long, kind: String, sig: Seq[Long],
      valid: Boolean)

  /** [[perceptualSignatures]] at an arbitrary multiple-of-64 grid
    * width — the saturation escape hatch its 64-bit scaladoc promises:
    * past ~2^16 media rows the 16-bit band keys of the narrow config
    * collide linearly, so a bigger lake WIDENS the signature
    * (128/256-bit grids) and keeps band keys ≥ 20 bits
    * ([[signaturePairsWide]] enforces the floor). Same aHash contract
    * at every width: channels averaged, equal pixel runs per cell,
    * threshold against the grid mean — a GLOBAL brightness shift
    * moves every cell and the mean together, so the invariance
    * survives widening (MultimodalSpec pins it at 128). Grid cells
    * beyond the pixel count stay empty and threshold to 0
    * deterministically — harmless for matching (identical payloads
    * stay identical), but they dilute per-band entropy, so the width
    * should track payload size, not exceed it. */
  def perceptualSignaturesN(media: Dataset[MediaRow], gridBits: Int): Dataset[MediaSigN] = {
    require(gridBits > 0 && gridBits % 64 == 0,
      s"gridBits must be a positive multiple of 64, got $gridBits")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      MediaCodec.decode(m.bytes) match {
        case Some((w, h, c, p)) =>
          val pixels = w * h
          val cell = new Array[Double](gridBits)
          val cnt = new Array[Long](gridBits)
          var i = 0
          while (i < pixels) {
            var s = 0; var ch = 0
            while (ch < c) { s += p(i * c + ch) & 0xFF; ch += 1 }
            val idx = (i.toLong * gridBits / pixels).toInt
            cell(idx) += s.toDouble / c; cnt(idx) += 1
            i += 1
          }
          // threshold against the mean of POPULATED cells only: when
          // gridBits exceeds the pixel count the empty cells would
          // otherwise drag the mean to ~half the true cell average and
          // every populated cell would read 1 — signatures degenerate
          // to one shared key and the banded join goes quadratic
          // (measured: a 0x5555… key held ~30% of the harness lake
          // before this guard). Empty cells emit 0 deterministically.
          // For payloads ≥ gridBits pixels every cell is populated and
          // this is EXACTLY the classical aHash mean.
          var mean = 0.0
          var nPop = 0L
          var j = 0
          while (j < gridBits) {
            if (cnt(j) > 0) { cell(j) /= cnt(j); mean += cell(j); nPop += 1 }
            j += 1
          }
          if (nPop == 0) {
            // A decodable zero-pixel payload has no populated cells:
            // mean would be 0/0 = NaN, every comparison false, and all
            // such rows would share the all-zero signature — one hot
            // band key, the exact degeneracy the populated-cell mean
            // guard closes for tiny payloads. Emit valid=false so the
            // banded joins' `valid` filter drops the row instead.
            MediaSigN(m.media_id, m.kind, Seq.fill(gridBits / 64)(0L),
              valid = false)
          } else {
            mean /= nPop
            val words = new Array[Long](gridBits / 64)
            j = 0
            while (j < gridBits) {
              if (cnt(j) > 0 && cell(j) >= mean) words(j >> 6) |= 1L << (j & 63)
              j += 1
            }
            MediaSigN(m.media_id, m.kind, words.toSeq, valid = true)
          }
        case None =>
          MediaSigN(m.media_id, m.kind, Seq.fill(gridBits / 64)(0L), valid = false)
      }
    })
  }

  /** Banded near-dup matching over perceptual signatures — the
    * DataFrame half: the 64-bit signature splits into `numBands`
    * equal bands; candidates equi-join on (band, key) — only
    * (id, long) pairs travel, the SimHash discipline — and verify
    * with `bit_count(sig_a ^ sig_b) ≤ maxHamming` (codegen'd).
    * Banding guarantee: a pair within `64/numBands − 1` flipped bits
    * has ≥ 1 intact band (pigeonhole) → recall 1.0 for exact and
    * near-exact duplicates; beyond that, OR-amplified probabilistic
    * recall, measured and gated in q_multimodal_dedup_bounds.
    *
    * Corpus-scale sizing: a 16-bit band key saturates once the lake
    * far exceeds 2^16 rows — per-key candidate lists then grow
    * linearly with N and candidate volume quadratically, the same
    * regime every fixed-width LSH hits. The production move is the
    * text-SimHash discipline: widen the signature (128/256-bit grids)
    * and keep bands ≥ 20 bits so expected per-key occupancy stays
    * O(1); this 64-bit config is sized for the harness lake. The
    * tier is deliberately NOT in the sf1+ soak — its ground-truth
    * pair count is itself superlinear (random-signature collisions
    * grow with C(N,2)), so a wall-clock exponent would measure the
    * corpus, not the operator (the q_graph_triangles exclusion,
    * perceptual edition). */
  def signaturePairs(sigs: DataFrame, maxHamming: Int = 16,
      numBands: Int = 4): DataFrame = {
    require(64 % numBands == 0)
    val bits = 64 / numBands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val banded = sigs.filter(col("valid"))
      .select(col("media_id"), col("sig"),
        posexplode(array((0 until numBands).map(b =>
          expr(s"shiftright(sig, ${b * bits}) & $mask")): _*))
          .as(Seq("band", "key")))
    val a = banded.select(col("media_id").as("id_a"), col("band"),
      col("key"), col("sig").as("sig_a"))
    val b = banded.select(col("media_id").as("id_b"), col("band"),
      col("key"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Denylist screening — the REGISTRY half of perceptual matching
    * (the PhotoDNA-style known-bad screen every media ingest runs):
    * corpus signatures probe a SMALL registry of banned signatures
    * instead of self-joining. Same 4×16-bit banding as
    * [[signaturePairs]], but the registry side is BROADCAST — the
    * corpus never shuffles at all: each corpus row's band keys probe
    * the broadcast band table map-side and survivors verify with the
    * codegen'd popcount. A production registry is thousands of
    * signatures (vs a corpus of billions), so candidate volume is
    * corpus-linear with an O(1) registry-collision constant; the
    * pigeonhole recall guarantee (≥ 1 intact band within
    * 64/numBands − 1 flips) carries over unchanged. Returns
    * (media_id, bad_id, hamming) per flagged match. */
  def denylistMatches(corpusSigs: DataFrame, denySigs: DataFrame,
      maxHamming: Int = 16, numBands: Int = 4): DataFrame = {
    require(64 % numBands == 0)
    val bits = 64 / numBands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    def banded(sigs: DataFrame) = sigs.filter(col("valid"))
      .select(col("media_id"), col("sig"),
        posexplode(array((0 until numBands).map(b =>
          expr(s"shiftright(sig, ${b * bits}) & $mask")): _*))
          .as(Seq("band", "key")))
    val c = banded(corpusSigs)
    val r = banded(denySigs)
      .select(col("media_id").as("bad_id"), col("band"),
        col("key"), col("sig").as("bad_sig"))
    c.join(broadcast(r), Seq("band", "key"))
      .select(col("media_id"), col("bad_id"), col("sig"), col("bad_sig"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sig ^ bad_sig)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_id"), col("bad_id"), col("hamming"))
  }

  /** The banded frame shared by [[signaturePairsWide]] and
    * [[bandOccupancy]]: one row per (media, band) with the band's key
    * sliced out of the word array (word `b / bandsPerWord`, offset
    * `(b % bandsPerWord) · bandBits`). */
  private def bandedWide(sigs: DataFrame, gridBits: Int, bandBits: Int): DataFrame = {
    require(bandBits >= 20,
      s"band keys below 20 bits saturate past ~2^16 rows (the narrow " +
        s"config's documented limit) — got $bandBits")
    require(64 % bandBits == 0 && gridBits % 64 == 0,
      s"bandBits must divide 64 and gridBits must be a multiple of 64, " +
        s"got gridBits=$gridBits bandBits=$bandBits")
    val bandsPerWord = 64 / bandBits
    val numBands = (gridBits / 64) * bandsPerWord
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val bandExprs = (0 until numBands).map { b =>
      val w = b / bandsPerWord
      val off = (b % bandsPerWord) * bandBits
      expr(s"shiftright(sig[$w], $off) & $mask")
    }
    sigs.filter(col("valid"))
      .select(col("media_id"), col("sig"),
        posexplode(array(bandExprs: _*)).as(Seq("band", "key")))
  }

  /** [[signaturePairs]] for wide ([[MediaSigN]]) signatures — the
    * production-scale config the narrow scaladoc points at: with
    * `bandBits ≥ 20` (enforced) expected per-key occupancy stays O(1)
    * well past 2^16 rows, so candidate volume grows linearly with the
    * lake, not quadratically. Pigeonhole guarantee at every width:
    * fewer than `numBands` flipped bits leave ≥ 1 band intact (each
    * flip damages at most one band) → recall exactly 1.0 for pairs
    * within `numBands − 1` flips — and trivially for verbatim
    * re-uploads — spec-pinned at 128 and 256 bits. The Hamming verify
    * is a per-word XOR popcount sum over the word array; only
    * (id, band-key) longs travel through the join, never media
    * bytes. [[bandOccupancy]] is the companion skew surface — gate it
    * (q_multimodal_dedup_wide_bounds does) so saturation is a
    * measured property, not a hope. */
  def signaturePairsWide(sigs: DataFrame, gridBits: Int,
      maxHamming: Int, bandBits: Int = 32): DataFrame = {
    val words = gridBits / 64
    val hammingExpr = (0 until words)
      .map(w => s"bit_count(sig_a[$w] ^ sig_b[$w])").mkString(" + ")
    val banded = bandedWide(sigs, gridBits, bandBits)
    val a = banded.select(col("media_id").as("id_a"), col("band"),
      col("key"), col("sig").as("sig_a"))
    val b = banded.select(col("media_id").as("id_b"), col("band"),
      col("key"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", expr(hammingExpr).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Per-(band, key) occupancy of the wide banded index — the skew
    * diagnostic for the candidate join: a hot key turns the equi-join
    * quadratic locally (C(occupancy, 2) candidate pairs), so the
    * expected-O(1) claim behind [[signaturePairsWide]] should be
    * GATED on the measured max, the q_skew_diagnostics discipline. */
  def bandOccupancy(sigs: DataFrame, gridBits: Int,
      bandBits: Int = 32): DataFrame =
    bandedWide(sigs, gridBits, bandBits)
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"))

  /** Deterministic perceptual perturbation for fixtures: re-encode
    * with the first 1/16th of the payload brightened by +100 (mod
    * 256) at a new id — a strong LOCAL edit touching ~4 of the 64
    * grid cells, the "cropped logo / watermark" analogue that a
    * near-dup tier must still catch. */
  def perturbed(media: Dataset[MediaRow], idOffset: Long): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      MediaCodec.decode(m.bytes) match {
        case Some((w, h, c, p)) =>
          val out = p.clone()
          var i = 0
          while (i < out.length / 16) { out(i) = (out(i) + 100).toByte; i += 1 }
          MediaRow(m.media_id + idOffset, m.kind, MediaCodec.encode(w, h, c, out))
        case None => m.copy(media_id = m.media_id + idOffset)
      }
    })
  }

  /** Frame sampling for video media: every `everyN`-th frame becomes
    * its own row (media_id, frame_idx, frame bytes as an 8×8×3 GRF1
    * image). The row explosion happens partition-locally. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else MediaCodec.decode(m.bytes) match {
        case Some((w, h, c, p)) if c % 3 == 0 =>
          val nFrames = c / 3
          val frameLen = w * h * 3
          (0 until nFrames by everyN).iterator.map { f =>
            val frame = new Array[Byte](frameLen)
            for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
              frame((y * w + x) * 3 + ch) = p((y * w + x) * c + f * 3 + ch)
            }
            Frame(m.media_id, f, MediaCodec.encode(w, h, 3, frame))
          }
        case _ => Iterator.empty
      }
    })
  }
}
