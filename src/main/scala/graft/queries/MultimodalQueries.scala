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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_features" -> (qMultimodalFeatures _))

  val oracles: Map[String, String] = Map.empty
}
