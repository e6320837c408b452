package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.DedupQueries

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("pipeline stages: verbatim dup dies at exact stage, near-dup at cluster stage") {
    // base doc (high quality), verbatim copy, near-dup copy, junk doc
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day in the park today ok"),
      (2L, "the quick brown fox jumps over the lazy dog and it is a fine day in the park today ok"),
      (3L, "quick brown fox jumps over the lazy dog and it is a fine day in the park today ok"),
      (4L, "!!! ### $$$"))
      .toDF("doc_id", "text")
    val r = Curation.curate(docs, minQuality = 0.5, minJaccard = 0.8)
    val survived = r.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survived == Set(1L), s"survivors: $survived")
    assert(r.accounting == Seq(
      "input" -> 4L,       // all four documents
      "quality" -> 3L,     // junk filtered
      "exact-dedup" -> 2L, // verbatim copy collapsed onto doc 1
      "near-dedup" -> 1L)) // near-dup copy clustered with doc 1, dropped
  }

  test("accounting is monotone non-increasing and survivors are input rows") {
    val r = Curation.curate(DedupQueries.corpusTriple(spark, sf001),
      DedupQueries.CurationMinQuality)
    val counts = r.accounting.map(_._2)
    assert(counts == counts.sorted.reverse, s"not monotone: ${r.accounting}")
    assert(counts.last > 0)
    // every planted verbatim copy is gone; every surviving id appears once
    val ids = r.survivors.select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length)
    val verbatim = ids.count(id => id >= DedupQueries.IdOffset && id < 2 * DedupQueries.IdOffset)
    assert(verbatim == 0, s"$verbatim verbatim copies survived")
  }
}
