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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_features" -> (qMultimodalFeatures _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _))

  val oracles: Map[String, String] = Map.empty
}
