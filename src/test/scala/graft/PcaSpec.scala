package graft

import org.apache.spark.sql.functions._

import graft.sim.Pca

/** The PCA tier's contract: the fitted basis is orthonormal, the
  * expression-side projection (dot products + folded centering
  * offsets) agrees with a driver-side recomputation from the same Fit
  * — the two paths share no code below the Fit struct, so an offset
  * sign error or a components transpose would show here. */
class PcaSpec extends SparkSpec {

  test("fit: orthonormal 16-basis over the 64-d embeddings") {
    val f = Pca.fit(spark, sf001)
    assert(f.components.length === 16)
    assert(f.mean.length === 64)
    assert(f.n === 500L)
    for (i <- f.components.indices; j <- i until f.components.length) {
      val dot = f.components(i).zip(f.components(j)).map(t => t._1 * t._2).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) <= 1e-8, s"c${i}.c$j = $dot")
    }
  }

  test("projection: expression path == driver-side (x − μ)·c recompute") {
    val f = Pca.fit(spark, sf001)
    val raw = Tables.embeddings(spark, sf001)
      .orderBy(col("vec_id")).limit(3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val got = Pca.project(spark, sf001)
      .filter(col("vec_id").isin(raw.map(_._1): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    raw.foreach { case (id, x) =>
      val want = f.components.map(c =>
        c.indices.map(t => c(t) * (x(t) - f.mean(t))).sum)
      val have = got(id)
      want.zip(have).foreach { case (w, h) =>
        assert(math.abs(w - h) <= 1e-9, s"vec $id: $w vs $h")
      }
    }
  }
}
