package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int = 5) =
    PageRank.pageRank(edges.toDF("src", "dst", "weight"), iters, damping = 0.85)
      .as[(String, Double)].collect().toMap

  test("uniform ring keeps the uniform distribution exactly") {
    val ring = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val r = ranks(ring)
    assert(r.keySet == Set("a", "b", "c"))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("a pointed-to hub outranks its spokes; mass stays <= 1") {
    // spokes all point at hub; hub points back at one spoke
    val star = Seq(("s1", "hub", 1L), ("s2", "hub", 1L), ("s3", "hub", 1L),
      ("hub", "s1", 1L))
    val r = ranks(star)
    assert(r("hub") > r("s2") && r("hub") > r("s3"))
    assert(r("s1") > r("s2")) // hub's only out-edge feeds s1
    assert(r.values.sum <= 1.0 + 1e-12)
  }

  test("one damped iteration matches the hand-computed update") {
    // b gets a's full mass; a,c get only the floor; c additionally
    // feeds b? no: edges a->b (w 3), b->c (w 1): after one iteration
    // from uniform 1/3: pr(b) = 0.15/3 + 0.85*(1/3), pr(c) same,
    // pr(a) = 0.15/3.
    val r = ranks(Seq(("a", "b", 3L), ("b", "c", 1L)), iters = 1)
    assert(math.abs(r("a") - 0.05) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 / 3)) < 1e-12)
    assert(math.abs(r("c") - (0.05 + 0.85 / 3)) < 1e-12)
  }

  test("weighted edges split mass proportionally") {
    // a -> b with 3x the weight of a -> c
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L)), iters = 1)
    val inB = (r("b") - 0.05) / 0.85
    val inC = (r("c") - 0.05) / 0.85
    assert(math.abs(inB / inC - 3.0) < 1e-9)
  }

  test("per-round checkpointing and bounded plain lineage agree") {
    val edges = (0 until 40)
      .map(i => (s"n${i % 8}", s"n${(i * 3 + 1) % 8}", (i % 4 + 1).toLong))
    val plain = ranks(edges) // interval 8 > iters 5: never cuts
    val ck = PageRank.pageRank(edges.toDF("src", "dst", "weight"), 5, 0.85,
        checkpointInterval = 1)
      .as[(String, Double)].collect().toMap
    assert(plain.keySet == ck.keySet)
    plain.foreach { case (k, v) => assert(math.abs(v - ck(k)) < 1e-12) }
  }
}
