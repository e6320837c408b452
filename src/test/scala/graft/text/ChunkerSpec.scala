package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chunker invariants: count formula, full coverage of the token
  * stream, exact overlap between consecutive chunks, and the edge
  * rules (short doc → one chunk, empty doc → none). */
class ChunkerSpec extends SparkSpec {

  import spark.implicits._

  private def docs(texts: (Long, String)*) = texts.toDF("doc_id", "text")

  test("chunk count follows 1 + ceil((n - size) / stride) and tails are short") {
    val words = (1 to 150).map(i => s"w$i").mkString(" ") // n=150, C=64, S=48
    val out = Chunker.chunk(docs((1L, words)), 64, 48)
      .orderBy(col("chunk_id")).collect()
    // ceil((150-64)/48) = 2 → 3 chunks
    assert(out.length == 3)
    assert(out.map(_.getInt(2)).toSeq == Seq(64, 64, 150 - 2 * 48))
    // chunk k starts at token k*48
    assert(out(1).getString(3).startsWith("w49 "))
    assert(out(2).getString(3).startsWith("w97 "))
  }

  test("consecutive chunks overlap by exactly size - stride tokens") {
    val words = (1 to 200).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunk(docs((1L, words)), 64, 48)
      .orderBy(col("chunk_id")).collect().map(_.getString(3).split(" ").toSeq)
    out.sliding(2).foreach { pair =>
      assert(pair(0).takeRight(16) == pair(1).take(16), "16-token overlap")
    }
  }

  test("chunks cover every token; short doc yields one chunk; empty doc none") {
    val words = (1 to 100).map(i => s"x$i").mkString(" ")
    val out = Chunker.chunk(
      docs((1L, words), (2L, "just three tokens"), (3L, "   ")), 64, 48)
      .collect()
    val covered = out.filter(_.getLong(0) == 1L)
      .flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"x$i").toSet, "full coverage")
    val short = out.filter(_.getLong(0) == 2L)
    assert(short.length == 1 && short.head.getInt(2) == 3)
    assert(!out.exists(_.getLong(0) == 3L), "empty doc yields no chunks")
  }
}
