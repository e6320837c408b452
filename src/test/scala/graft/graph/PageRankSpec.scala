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

  test("warm start from a uniform prior reproduces the cold start") {
    val edges = (0 until 40)
      .map(i => (s"n${i % 8}", s"n${(i * 3 + 1) % 8}", (i % 4 + 1).toLong))
    val cold = ranks(edges)
    val uniform = (0 until 8).map(i => (s"n$i", 1.0 / 8)).toDF("node", "pr")
    val warm = PageRank.pageRankFrom(edges.toDF("src", "dst", "weight"),
        uniform, iters = 5, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(cold.keySet == warm.keySet)
    // renormalization divides by Σ(1/8)·8 ≈ 1 — allow accumulated ulps
    cold.foreach { case (k, v) => assert(math.abs(v - warm(k)) < 1e-9) }
  }

  test("warm start beats cold start at equal rounds after a small graph delta") {
    // "yesterday": a 60-edge graph; "today": the same graph plus a
    // SMALL delta — one new node on two unit edges (a crawl finding one
    // new domain, not a topology rewrite; a large delta moves the fixed
    // point far enough that uniform can be the closer start and warm
    // loses its advantage, which is the documented contract).
    // Reference = 12 cold rounds on today's graph.
    val yesterday = (0 until 60)
      .map(i => (s"n${i % 10}", s"n${(i * 7 + 1) % 10}", (i % 3 + 1).toLong))
    val delta = Seq(("n0", "n_new", 1L), ("n_new", "n1", 1L))
    val today = yesterday ++ delta
    def rk(es: Seq[(String, String, Long)], it: Int) =
      PageRank.pageRank(es.toDF("src", "dst", "weight"), it, 0.85)
        .as[(String, Double)].collect().toMap
    val reference = rk(today, 12)
    val prior = PageRank.pageRank(yesterday.toDF("src", "dst", "weight"), 8, 0.85)
    val warm = PageRank.pageRankFrom(today.toDF("src", "dst", "weight"),
        prior, iters = 2, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val cold2 = rk(today, 2)
    def dist(m: Map[String, Double]) =
      reference.map { case (k, v) => math.abs(v - m.getOrElse(k, 0.0)) }.max
    // the new node is present at the floor even though the prior never
    // saw it
    assert(warm.contains("n_new"))
    assert(dist(warm) < dist(cold2),
      s"warm ${dist(warm)} not better than cold ${dist(cold2)} at 2 rounds")
  }
}
