package graft.multimodal

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  lazy val media = syntheticMedia(
    Tables.documents(spark, sf001).limit(60), "doc_id", "text").cache()

  test("codec round-trips and rejects garbage") {
    val payload = Array.tabulate(2 * 3 * 3)(_.toByte)
    val enc = MediaCodec.encode(2, 3, 3, payload)
    val Some((w, h, c, p)) = MediaCodec.decode(enc)
    assert((w, h, c) == (2, 3, 3) && p.toSeq == payload.toSeq)
    assert(MediaCodec.decode("not media".getBytes).isEmpty)
    assert(MediaCodec.decode(enc.dropRight(1)).isEmpty) // truncated
    assert(MediaCodec.decode(null).isEmpty)
  }

  test("decodeMeta: all synthetic media valid, dims consistent with payload") {
    val meta = decodeMeta(media).collect()
    assert(meta.length == 60)
    assert(meta.forall(_.valid))
    assert(meta.forall(m => m.payload_len == m.width * m.height * m.channels))
    assert(meta.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("corrupt rows yield valid=false, not task failure") {
    import spark.implicits._
    val bad = media.map(m => m.copy(bytes = m.bytes.take(10)))
    val meta = decodeMeta(bad).collect()
    assert(meta.forall(!_.valid))
  }

  test("features: fixed dim, normalized, deterministic") {
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 60)
    f1.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3)
    }
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize: images capped at maxDim, aspect preserved-ish, others untouched") {
    val out = decodeMeta(resize(media, maxDim = 4)).collect()
    val images = out.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { m => assert(math.max(m.width, m.height) <= 4 && m.valid) }
    val audio = decodeMeta(media).collect().filter(_.kind == "audio")
    val audioAfter = out.filter(_.kind == "audio")
    assert(audio.map(m => (m.media_id, m.width)).toSet ==
      audioAfter.map(m => (m.media_id, m.width)).toSet)
  }

  test("perceptual signature: global brightness shift is exactly invariant; local edit moves few bits") {
    import spark.implicits._
    def shiftAll(m: MediaRow, delta: Int, off: Long): MediaRow = {
      val Some((w, h, c, p)) = MediaCodec.decode(m.bytes)
      MediaRow(m.media_id + off, m.kind,
        MediaCodec.encode(w, h, c, p.map(b => (((b & 0xFF) + delta) % 256).toByte)))
    }
    val rows = media.collect().take(12)
    // +40 to every byte, wrap-free inputs only: cells and mean shift
    // together, so every threshold comparison — and the signature —
    // is unchanged
    val safe = rows.filter { m =>
      val Some((_, _, _, p)) = MediaCodec.decode(m.bytes)
      p.forall(b => (b & 0xFF) + 40 < 256)
    }
    if (safe.nonEmpty) {
      val both = safe.toSeq.toDS().union(safe.map(shiftAll(_, 40, 100000L)).toSeq.toDS())
      val sigs = perceptualSignatures(both).collect().map(s => s.media_id -> s.sig).toMap
      safe.foreach(m => assert(sigs(m.media_id) == sigs(m.media_id + 100000L),
        s"brightness shift changed signature for ${m.media_id}"))
    }
    // the fixture's local perturbation flips SOME bits but stays well
    // under the verify threshold
    val base = rows.toSeq.toDS()
    val pert = Multimodal.perturbed(base, 100000L)
    val sigs = perceptualSignatures(base.union(pert)).collect()
      .map(s => s.media_id -> s.sig).toMap
    rows.foreach { m =>
      val d = java.lang.Long.bitCount(sigs(m.media_id) ^ sigs(m.media_id + 100000L))
      assert(d <= 16, s"local edit moved ${d} bits for ${m.media_id} — over the verify threshold")
    }
  }

  test("signature pairs: identical signatures always pair (banding recall 1.0 at hamming 0)") {
    import spark.implicits._
    val base = media.limit(20)
    val copies = base.map(m => m.copy(media_id = m.media_id + 100000L))
    val got = signaturePairs(perceptualSignatures(base.union(copies)).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = base.collect().map(_.media_id)
    ids.foreach { id =>
      assert(got.exists(p => p._1 == id && p._2 == id + 100000L && p._3 == 0),
        s"exact copy of $id not paired at hamming 0")
    }
  }

  test("denylist: verbatim registry copies always flagged at hamming 0; registry never matches itself") {
    import spark.implicits._
    val reg = media.limit(10)
    val copies = reg.map(m => m.copy(media_id = m.media_id + 100000L))
    val got = Multimodal.denylistMatches(
        perceptualSignatures(copies).toDF(),
        perceptualSignatures(reg).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    reg.collect().map(_.media_id).foreach { id =>
      assert(got.exists(m => m._1 == id + 100000L && m._2 == id && m._3 == 0),
        s"verbatim copy of registry item $id not flagged")
    }
    // gate row end-to-end at sf0.001
    val bounds = graft.queries.MultimodalQueries
      .qMultimodalDenylistBounds(spark, sf001).collect().head
    (1 until 5).foreach(i => assert(bounds.getBoolean(i), s"bounds col $i"))
  }

  test("wide signatures: pigeonhole recall 1.0 at 128 and 256 bits for sub-numBands flips") {
    // pure DataFrame-level claim, no codec needed: signaturePairsWide
    // must recover EVERY pair whose Hamming distance is under the band
    // count, because each flipped bit damages at most one band and at
    // least one band then survives intact. Plant synthetic word-array
    // signatures plus twins with exactly numBands-1 flipped bits, each
    // flip in a DIFFERENT band (the adversarial placement: maximum
    // bands damaged for the flip budget), and verbatim twins at 0.
    import spark.implicits._
    for (gridBits <- Seq(128, 256); bandBits = 32) {
      val words = gridBits / 64
      val numBands = gridBits / bandBits
      val rnd = new scala.util.Random(gridBits)
      val base = (0 until 40).map { i =>
        (i.toLong, "synthetic", Seq.fill(words)(rnd.nextLong()), true)
      }
      val flipped = base.map { case (id, k, sig, v) =>
        val arr = sig.toArray
        // numBands-1 flips, one per band starting at band 1 — band 0
        // is the guaranteed survivor
        (1 until numBands).foreach { b =>
          val bit = b * bandBits + rnd.nextInt(bandBits)
          arr(bit / 64) ^= 1L << (bit % 64)
        }
        (id + 1000L, k, arr.toSeq, v)
      }
      val verbatim = base.map { case (id, k, sig, v) => (id + 2000L, k, sig, v) }
      val sigs = (base ++ flipped ++ verbatim)
        .toDF("media_id", "kind", "sig", "valid")
      val got = Multimodal.signaturePairsWide(sigs, gridBits,
        maxHamming = numBands, bandBits = bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      base.foreach { case (id, _, _, _) =>
        assert(got.contains((id, id + 1000L, numBands - 1)),
          s"gridBits=$gridBits: ${numBands - 1}-flip twin of $id not recovered")
        assert(got.contains((id, id + 2000L, 0)),
          s"gridBits=$gridBits: verbatim twin of $id not recovered at hamming 0")
      }
    }
  }

  test("wide signatures: 128-bit brightness invariance and narrow/wide word-0 agreement") {
    import spark.implicits._
    // the wide path at 64 bits IS the narrow signature (same loop),
    // so MediaSig.sig must equal MediaSigN word 0 at gridBits=64
    val narrow = perceptualSignatures(media).collect()
      .map(s => s.media_id -> s.sig).toMap
    val wide64 = perceptualSignaturesN(media, 64).collect()
      .map(s => s.media_id -> s.sig.head).toMap
    assert(narrow == wide64)
    // global brightness shift invariance survives widening: cells and
    // the populated-cell mean move together at any width
    def shiftAll(m: MediaRow, delta: Int, off: Long): MediaRow = {
      val Some((w, h, c, p)) = MediaCodec.decode(m.bytes)
      MediaRow(m.media_id + off, m.kind,
        MediaCodec.encode(w, h, c, p.map(b => (((b & 0xFF) + delta) % 256).toByte)))
    }
    val rows = media.collect().take(12)
    val safe = rows.filter { m =>
      val Some((_, _, _, p)) = MediaCodec.decode(m.bytes)
      p.forall(b => (b & 0xFF) + 40 < 256)
    }
    if (safe.nonEmpty) {
      val both = safe.toSeq.toDS().union(safe.map(shiftAll(_, 40, 100000L)).toSeq.toDS())
      val sigs = perceptualSignaturesN(both, 128).collect()
        .map(s => s.media_id -> s.sig).toMap
      safe.foreach(m => assert(sigs(m.media_id) == sigs(m.media_id + 100000L),
        s"128-bit brightness shift changed signature for ${m.media_id}"))
    }
  }

  test("frame sampling: every 2nd frame, each a decodable 3-channel image") {
    val videos = decodeMeta(media).collect().filter(_.kind == "video")
    val frames = sampleFrames(media, everyN = 2).collect()
    val expected = videos.map(v => (v.channels / 3 + 1) / 2).sum
    assert(frames.length == expected)
    frames.foreach { f =>
      val Some((w, h, c, _)) = MediaCodec.decode(f.frame_bytes)
      assert((w, h, c) == (8, 8, 3))
      assert(f.frame_idx % 2 == 0)
    }
  }
}
