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
