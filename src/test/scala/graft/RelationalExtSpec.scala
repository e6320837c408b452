package graft

import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQueries, ExtraQueries, JoinQueries}

/** Specs for the round-9 relational/retrieval additions: full-outer
  * join, unpivot, histogram, BM25, MAD outliers, triangle census.
  * BM25 / MAD / triangles are cross-checked against independent
  * in-memory recomputations from the collected sf0.001 tables (500
  * docs, 20 sources — small enough to brute-force exactly).
  */
class RelationalExtSpec extends SparkSpec {

  test("full outer: matched, left-only and right-only row classes all present") {
    val df = JoinQueries.qJoinFullOuter(spark, sf001).cache()
    assert(df.filter(col("click_value").isNotNull && col("purchase_value").isNotNull).count() > 0)
    assert(df.filter(col("click_value").isNull && col("purchase_value").isNotNull).count() > 0)
    assert(df.filter(col("click_value").isNotNull && col("purchase_value").isNull).count() > 0)
    // never a row with neither side, and user_id is unique
    assert(df.filter(col("click_value").isNull && col("purchase_value").isNull).count() == 0)
    assert(df.count() == df.select(col("user_id")).distinct().count())
    df.unpersist()
  }

  test("full outer plan: no broadcast — both sides must keep unmatched rows") {
    val plan = JoinQueries.qJoinFullOuter(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"))
    assert(!plan.contains("BroadcastHashJoin"))
  }

  test("unpivot inverts pivot: equals the direct long-form aggregate") {
    val got = ExtraQueries.qUnpivot(spark, sf001)
    val direct = Tables.events(spark, sf001)
      .groupBy(col("user_id"), col("event_type"))
      .agg(round(sum(col("value")), 9).as("total"))
      .select(col("user_id"), col("event_type"), col("total"))
    assert(got.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(got).count() == 0)
  }

  test("histogram: counts conserve the scan, values sit inside their bucket") {
    val df = ExtraQueries.qHistogram(spark, sf001).cache()
    val total = Tables.events(spark, sf001).count()
    assert(df.agg(sum(col("n"))).head.getLong(0) == total)
    val bad = df.filter(
      col("lo") < col("bucket") * 50.0 || col("hi") >= (col("bucket") + 1) * 50.0)
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("bm25: exact match against an in-memory reference scorer") {
    val qTerms = Set("spark", "query", "join")
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val dl = docs.map { case (id, t) => id -> t.length.toLong }.toMap
    val n = docs.length.toLong
    val avgdl = dl.values.sum.toDouble / n
    val tf = docs.flatMap { case (id, t) =>
      t.filter(qTerms).groupBy(identity).map { case (term, occ) => (id, term, occ.length.toLong) }
    }
    val dfT = tf.groupBy(_._2).map { case (term, rows) => term -> rows.length.toLong }
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scores = tf.groupBy(_._1).map { case (id, rows) =>
      val s = rows.map { case (_, term, f) =>
        val df = dfT(term)
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
      }.sum
      id -> r9(s)
    }
    val expect = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = AnalyticsQueries.qBm25(spark, sf001)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == expect)
  }

  test("mad outliers: exact match against an in-memory reference on every source") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2.0
    }
    val rows = Tables.documents(spark, sf001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val xs = rs.map(_._2).toSeq
      val med = median(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = median(devs)
      val out = devs.count(_ > 3.0 * 1.4826 * mad).toLong
      src -> (xs.length.toLong, med, mad, out)
    }
    val got = AnalyticsQueries.qMadOutliers(spark, sf001).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nd, med, mad, out) = expect(r.getString(0))
      assert(r.getLong(1) == nd && r.getDouble(2) == med
        && r.getDouble(3) == mad && r.getLong(4) == out,
        s"source ${r.getString(0)}")
    }
  }

  test("triangles: exact match against an in-memory census of the planted graph") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val srcs = docs.map(_._2).distinct.sorted
    val idx = srcs.zipWithIndex.toMap
    val n = srcs.length.toLong
    val edges = docs.map { case (id, src) =>
      val a = idx(src).toLong
      val b = (a + 1L + id % math.max(1L, n - 1L)) % n
      val (x, y) = (srcs(a.toInt), srcs(b.toInt))
      if (x < y) (x, y) else (y, x)
    }.filter { case (x, y) => x != y }.toSet
    val verts = edges.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    // inner generator must be a Seq: a Set-typed inner collection would
    // collapse the yielded wedges per outer edge and undercount
    val tri = (for {
      (a, b) <- edges.toSeq
      (b2, c) <- edges.toSeq if b2 == b
      if edges.contains((a, c))
    } yield 1).size.toLong
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map(_._2.length.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    val row = AnalyticsQueries.qGraphTriangles(spark, sf001).collect().head
    assert(row.getLong(0) == verts.distinct.length.toLong)
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == tri)
    assert(row.getDouble(3) == 3.0 * tri / wedges)
  }

  test("quantile normalize: matches a brute-force empirical-CDF mapping; monotone, domain-closed, count-preserving") {
    val out = ExtraQueries.qQuantileNormalize(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val raw = graft.Tables.documents(spark, sf001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val globalSorted = raw.map(_._2).sorted
    val n = globalSorted.length.toLong
    val globalHist = raw.groupBy(_._2).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val bySource = raw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // brute-force G^-1(F_s(x)) per (source, value)
    val expected = bySource.flatMap { case (s, xs) =>
      val ns = xs.length.toLong
      val cnts = xs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      val globalCum = globalHist.scanLeft(("", 0L)) {
        case ((_, cum), (v, g)) => (v.toString, cum + g)
      }.tail.map { case (v, cum) => (v.toLong, cum) }
      var below = 0L
      cnts.map { case (c, cnt) =>
        val rhs = (2 * below + cnt + 1) * n
        val norm = globalCum.find { case (_, cum) => 2 * cum * ns >= rhs }.get._1
        below += cnt
        (s, c, cnt, norm)
      }
    }.toSet
    assert(out.toSet == expected)
    // monotone within source; normalized values come from the global
    // domain; multiplicities preserved per source
    val globalSet = globalSorted.toSet
    out.groupBy(_._1).foreach { case (s, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)), s)
      assert(rows.forall(r => globalSet.contains(r._4)), s)
      assert(rows.map(_._3).sum == bySource(s).length.toLong, s)
    }
  }

  test("gini: exact match against the BigInt rank identity; bounded in [0, 1)") {
    val out = ExtraQueries.qGiniConcentration(spark, sf001).collect()
    assert(out.length == 1)
    val cents = Tables.orders(spark, sf001)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * lit(100)).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = cents.sortBy(p => (p._2, p._1)).map(_._2)
    val n = sorted.length
    val sx = sorted.map(BigInt(_)).sum
    val srx = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (2 * srx - BigInt(n + 1) * sx).toDouble / (BigInt(n) * sx).toDouble
    val r = out.head
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == sx.toDouble / 100.0)
    assert(r.getDouble(2) == gini, s"${r.getDouble(2)} vs $gini")
    assert(gini >= 0.0 && gini < 1.0)
    // ties land identically under any rank permutation: perturb tie order
    val perm = cents.sortBy(p => (p._2, -p._1)).map(_._2)
    val srx2 = perm.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    assert(srx2 == srx, "rank identity must be tie-order invariant")
  }

  test("pseudonymize: injective on the harness ids, stable, and aggregate-preserving") {
    val out = ExtraQueries.qPseudonymize(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val raw = Tables.events(spark, sf001)
      .select(col("user_id"), round(col("value") * lit(100)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = raw.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    // injectivity: one pseudonym per user, no merges
    assert(out.length == perUser.size, "pseudonym collision merged two users")
    // stability + linkability: each user's aggregate appears intact under
    // the keyed digest recomputed driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    perUser.foreach { case (uid, (n, cents)) =>
      val dig = md.digest(s"graft-pepper:$uid".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val row = out.find(_._1 == dig)
      assert(row.isDefined, s"user $uid pseudonym missing")
      assert(row.get._2 == n && row.get._3 == cents.toDouble / 100.0, s"user $uid")
    }
  }

  test("k-anonymity: group sizes and diversity recompute; below_k matches the threshold") {
    val out = ExtraQueries.qKAnonymity(spark, sf001).collect()
    val raw = Tables.customer(spark, sf001)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getDouble(2)))
    val groups = raw.groupBy(_._1)
    assert(out.length == groups.size)
    out.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val vs = groups(key).map(_._2)
      assert(r.getLong(2) == vs.length.toLong, s"k of $key")
      val l = (if (vs.exists(_ < 0)) 1 else 0) + (if (vs.exists(_ >= 0)) 1 else 0)
      assert(r.getInt(3) == l, s"l of $key")
      assert(r.getBoolean(4) == (vs.length < 6), s"below_k of $key")
    }
    // the audit must actually surface small cells on the harness data
    assert(out.exists(_.getBoolean(4)), "no below-k group — the gate is vacuous")
  }

  test("benford: shares recompute exactly; benford masses telescope to 1") {
    val out = ExtraQueries.qBenfordDigits(spark, sf001).collect()
    val raw = Tables.orders(spark, sf001)
      .select(round(col("o_totalprice") * lit(100)).cast("long")).collect()
      .map(_.getLong(0))
    assert(raw.forall(_ > 0), "cent totals must be positive for a leading digit")
    val exp = raw.groupBy(_.toString.take(1)).view.mapValues(_.length.toLong).toMap
    assert(out.map(_.getString(0)).toSet == exp.keySet)
    assert(out.map(_.getString(0)).forall(d => d >= "1" && d <= "9"))
    val n = raw.length.toLong
    out.foreach { r =>
      val d = r.getString(0)
      assert(r.getLong(1) == exp(d), s"digit $d count")
      assert(r.getDouble(2) == exp(d).toDouble / n, s"digit $d share")
      val ben = math.log10((d.toLong + 1).toDouble / d.toLong)
      assert(math.abs(r.getDouble(3) - ben) <= 1e-9, s"digit $d benford")
      assert(math.abs(r.getDouble(4) - (exp(d).toDouble / n - ben)) <= 2e-9)
    }
    // Σ_d log10((d+1)/d) telescopes to log10(10) = 1 over d = 1..9
    val mass = (1 to 9).map(d => math.log10((d + 1).toDouble / d)).sum
    assert(math.abs(mass - 1.0) < 1e-12)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-12,
      "observed shares must sum to 1")
  }
}
