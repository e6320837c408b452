package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

class AnalyticsQueriesSpec extends SparkSpec {

  test("tfidf: at most 3 terms per doc, ranks contiguous, scores non-increasing") {
    val df = AnalyticsQueries.qTfidf(spark, sf001).cache()
    val perDoc = df.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("max_rk"),
        min(col("rk")).as("min_rk"))
    assert(perDoc.filter(col("n") > 3 || col("max_rk") =!= col("n") || col("min_rk") =!= 1).count() == 0)
    // within a doc, score never increases as rank increases
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rk"))
    val bad = df.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("basket pairs: canonical order, counts bounded by orders, non-increasing, no harness truncation") {
    val rows = AnalyticsQueries.qBasketPairs(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pairs must be canonical")
    val nOrders = graft.Tables.orders(spark, sf001).count()
    assert(rows.forall(_.getLong(2) <= nOrders))
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, "support must be sorted desc")
    // the cap is headroom on real baskets: nothing truncated at sf0.001
    assert(rows.forall(_.getLong(3) == 0L), "harness baskets must not hit the cap")
  }

  test("basket pairs cap: planted mega-basket bounded to C(cap,2); small baskets match the uncapped join; truncation surfaced") {
    import spark.implicits._
    // 50 small baskets of 4 parts (ids < 1000) + one degenerate basket
    // holding 500 parts (ids 1001..1500) — the C(basket,2) hazard
    val small = for { ok <- 1 to 50; j <- 1 to 4 }
      yield (ok.toLong, (ok * 7L + j * 13L) % 97L)
    val mega = (1 to 500).map(pk => (999L, 1000L + pk))
    val baskets = (small ++ mega).toDF("ok", "pk").distinct()
      .localCheckpoint(true)
    val out = AnalyticsQueries.basketPairs(baskets, cap = 32).cache()
    // the mega basket contributes exactly C(32,2) pairs (its 32
    // smallest part keys), not C(500,2) = 124 750
    val megaSupport = out.filter(col("part_a") > 1000L)
      .agg(coalesce(sum(col("n_orders")), lit(0L))).head().getLong(0)
    assert(megaSupport == 32L * 31 / 2, s"mega basket not capped: $megaSupport")
    // truncation is visible on every row, and counts exactly 1 basket
    assert(out.select(col("n_capped_baskets")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // small baskets are untouched: pair supports equal the plain join's
    val smallB = baskets.filter(col("pk") < 1000L)
    val plain = smallB.as("a").join(smallB.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
    val capped = out.filter(col("part_a") < 1000L && col("part_b") < 1000L)
      .select(col("part_a"), col("part_b"), col("n_orders"))
    assert(capped.exceptAll(plain).count() == 0 &&
      plain.exceptAll(capped).count() == 0,
      "small-basket pair supports must be identical to the uncapped join")
    out.unpersist()
  }

  test("seasonal decompose: identity holds, per-hour-of-day residual means vanish, trend inside data range") {
    val out = AnalyticsQueries.qSeasonalDecompose(spark, sf001).cache()
    val n = out.count()
    assert(n > 0)
    // additive identity y = trend + seasonal + resid (float-tight)
    val badId = out.filter(
      abs(col("y") - col("trend") - col("seasonal") - col("resid")) > 1e-6).count()
    assert(badId == 0)
    // seasonal is the mean detrended value per hour-of-day ESTIMATED
    // over full ±12 frames (the integer-exact r13 spelling), so the
    // residual means per hour-of-day vanish by construction over
    // exactly those rows: in a ROWS frame the full-frame rows are
    // positions 12 .. n-13 of the hour_ts order.
    val pos = org.apache.spark.sql.expressions.Window.orderBy(col("hour_ts"))
    val hodMeans = out
      .withColumn("i", row_number().over(pos))
      .filter(col("i") > 12 && col("i") <= lit(n - 12))
      .withColumn("hod", hour(col("hour_ts")))
      .groupBy(col("hod")).agg(avg(col("resid")).as("m"))
      .filter(abs(col("m")) > 1e-6).count()
    assert(hodMeans == 0, "per-hod full-frame residual means must vanish")
    // a moving average can never leave the data's range
    val r = out.agg(min(col("y")).as("lo"), max(col("y")).as("hi")).head()
    val badTrend = out.filter(col("trend") < r.getDouble(0) - 1e-9 ||
      col("trend") > r.getDouble(1) + 1e-9).count()
    assert(badTrend == 0)
    out.unpersist()
  }

  test("rolling anomaly: current row excluded from its baseline; degenerate frames NULL; z recomputes") {
    val out = AnalyticsQueries.qRollingAnomaly(spark, sf001).cache()
    // z must recompute from the emitted baseline wherever defined
    val badZ = out.filter(col("z").isNotNull &&
      abs(col("z") - (col("value") - col("base_mean")) / col("base_sd")) > 1e-9)
    assert(badZ.count() == 0)
    // sd defined ⇒ mean defined; z defined ⇒ sd > 0
    assert(out.filter(col("base_sd").isNotNull && col("base_mean").isNull).count() == 0)
    assert(out.filter(col("z").isNotNull && !(col("base_sd") > 0.0)).count() == 0)
    // per user: first event has an EMPTY trailing frame (all NULL) and
    // the second's baseline mean is exactly the first's value with sd
    // NULL (n=1 → stddev_samp undefined) — the current-row exclusion
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect().groupBy(_.getLong(0))
    val rows = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    ev.foreach { case (_, es) =>
      val sorted = es.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
      val first = sorted.head
      assert(rows(first.getLong(2)) == ((None, None)),
        s"first event ${first.getLong(2)} must have an empty baseline")
      if (sorted.length > 1) {
        val second = sorted(1)
        val (m, sd) = rows(second.getLong(2))
        assert(m.contains(first.getDouble(3)) && sd.isEmpty,
          s"second event ${second.getLong(2)}: baseline must be exactly the first value, sd undefined")
      }
    }
    out.unpersist()
  }

  test("ewma: first event equals its own value; smoother stays inside the trailing range; exact replay") {
    val out = AnalyticsQueries.qEwmaSmooth(spark, sf001).cache()
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect().groupBy(_.getLong(0))
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ev.foreach { case (_, es) =>
      val sorted = es.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
      // independent in-memory replay of the 8-term integer unrolling
      val cents = sorted.map(r => math.round(r.getDouble(3) * 100))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val terms = (0 until 8).filter(_ <= i)
        val num = terms.map(k => cents(i - k) * (1L << (7 - k))).sum
        val mass = terms.map(k => 1L << (7 - k)).sum
        val want = num.toDouble / (100.0 * mass)
        val g = got(r.getLong(2))
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(want),
          s"event ${r.getLong(2)}: ewma $g != replay $want")
        // a weighted mean can never leave its window's range
        val window = terms.map(k => sorted(i - k).getDouble(3))
        assert(g >= window.min - 1e-9 && g <= window.max + 1e-9)
      }
    }
    out.unpersist()
  }

  test("level shift: edges NULL, planted step detected at the boundary with positive z") {
    import spark.implicits._
    import java.sql.Timestamp
    // synthetic: one user, 12 quiet values with a little jitter, then
    // 12 values stepped up by 4.00 — the max shift_z must sit exactly
    // where the lead window first covers the new level
    val rows = (0 until 24).map { i =>
      val v = (if (i < 12) 1.00 else 5.00) + (i % 3) * 0.01
      (i.toLong, new Timestamp(1700000000000L + i * 60000L), 1L, "view", v)
    }
    val dir = graft.TempDirs.create("graft-levelshift").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.qLevelShift(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // first 8 events: trailing frame partial -> mean_trail NULL
    (0 until 8).foreach(i => assert(byId(i.toLong).isNullAt(3), s"event $i"))
    // last 7 events: lead frame partial -> mean_lead NULL
    (17 until 24).foreach(i => assert(byId(i.toLong).isNullAt(4), s"event $i"))
    val scored = out.filter(!_.isNullAt(5)).map(r => r.getLong(0) -> r.getDouble(5))
    assert(scored.nonEmpty)
    val (argmax, zmax) = scored.maxBy(_._2)
    assert(argmax == 12L,
      s"max shift_z at event $argmax, expected the step at 12 (scores: ${scored.toSeq.sorted})")
    assert(zmax > 3.0, s"step z $zmax not significant")
  }

  test("rfm: segment digits in 1-5, quintiles balanced within 1, recency non-negative") {
    val rows = AnalyticsQueries.qRfm(spark, sf001).collect()
    val nCust = rows.length
    assert(nCust > 0)
    assert(rows.forall(_.getInt(1) >= 0), "recency_days >= 0")
    val digits = rows.map(_.getString(4))
    assert(digits.forall(s => s.length == 3 && s.forall(c => c >= '1' && c <= '5')))
    // ntile balance: each score's bucket sizes differ by at most 1
    (0 until 3).foreach { pos =>
      val sizes = digits.groupBy(_.charAt(pos)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"score $pos unbalanced: $sizes")
    }
  }

  test("session funnel: stage counts are monotone and bounded by total sessions") {
    val row = AnalyticsQueries.qSessionFunnel(spark, sf001).head()
    val (n, v, c, p) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n > 0 && n >= v && v >= c && c >= p && p >= 0,
      s"funnel not monotone: ($n, $v, $c, $p)")
    // sessions are finer than users: at least one session per active user
    val nUsers = graft.Tables.events(spark, sf001).select("user_id").distinct().count()
    assert(n >= nUsers)
  }

  test("corpus divergence: jsd in [0, ln 2], turnover masses are probabilities") {
    val r = AnalyticsQueries.qCorpusDivergence(spark, sf001).head()
    val (vp, vq) = (r.getLong(0), r.getLong(1))
    val jsd = r.getDouble(4)
    val (pOnly, qOnly) = (r.getDouble(5), r.getDouble(6))
    assert(vp > 0 && vq > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-12, s"jsd $jsd out of range")
    assert(pOnly >= 0.0 && pOnly <= 1.0 && qOnly >= 0.0 && qOnly <= 1.0)
    // the two slices share the synthetic vocabulary, so divergence is
    // well below the disjoint-vocab maximum
    assert(jsd < 0.5 * math.log(2.0), s"slices of one corpus should not read near-disjoint: $jsd")
  }

  test("bigram LM: n_bigrams = n_tokens - 1, ppl = exp(avg_nll), smoothing keeps nll positive") {
    val bi = AnalyticsQueries.qLmBigram(spark, sf001).cache()
    val uni = AnalyticsQueries.qLmScore(spark, sf001)
      .select(col("doc_id"), col("n_tokens"))
    // every harness doc's tokens are non-empty, so bigram count is
    // exactly token count minus one
    val joined = bi.join(uni, "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("n_tokens") - 1).count() == 0)
    // internal consistency at the published rounding: ppl re-derives
    // from avg_nll within the round-6 grid
    val bad = bi.filter(abs(col("ppl") - exp(col("avg_nll"))) > col("ppl") * 1e-4)
    assert(bad.count() == 0)
    // add-1 smoothing: probabilities < 1 strictly (pc + V > bc + 1
    // whenever V > 1), so NLL is strictly positive
    assert(bi.filter(col("avg_nll") <= 0).count() == 0)
    bi.unpersist()
  }

  test("skyline: prices non-decreasing along the date-sorted frontier; members undominated") {
    val rows = AnalyticsQueries.qSkyline(spark, sf001).collect()
    assert(rows.nonEmpty)
    // survivors' prices are monotone non-decreasing in date order: each
    // survivor's price ≥ the max over all strictly-earlier dates, which
    // includes every earlier survivor
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => b >= a })
    // spot-check against the definition: no order in the full table
    // strictly dominates the first and last frontier rows
    val orders = graft.Tables.orders(spark, sf001)
    for (r <- Seq(rows.head, rows.last)) {
      val dom = orders.filter(col("o_orderdate") < lit(r.get(1))
        && col("o_totalprice") > r.getDouble(2)).count()
      assert(dom == 0, s"frontier row ${r.getLong(0)} is dominated")
    }
  }

  test("interpolate: masked rows reconstruct from time-weighted neighbors; boundaries take nearest") {
    val out = AnalyticsQueries.qInterpolate(spark, sf001).cache()
    // non-masked rows pass through untouched
    assert(out.filter(col("value_masked").isNotNull
      && col("value_interp") =!= col("value_masked")).count() == 0)
    // every masked row is filled (harness: every user has non-null rows)
    assert(out.filter(col("value_masked").isNull).count() > 0)
    assert(out.filter(col("value_masked").isNull && col("value_interp").isNull).count() == 0)
    // interpolated values sit within the neighbor envelope: between the
    // per-user min and max of unmasked values
    val env = out.filter(col("value_masked").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("value_masked")).as("lo"), max(col("value_masked")).as("hi"))
    val outside = out.filter(col("value_masked").isNull)
      .join(env, Seq("user_id"))
      .filter(col("value_interp") < col("lo") || col("value_interp") > col("hi"))
    assert(outside.count() == 0)
    out.unpersist()
  }

  test("interpolate: exact arithmetic on a hand-built gap") {
    import spark.implicits._
    // user 1: values at t=0s (10.0) and t=100s (30.0); the masked row at
    // t=25s (event_id 7, 7%7==0) must land at 10 + 20*0.25 = 15.0
    val rows = Seq(
      (1L, 1L, 0L, 10.0), (7L, 1L, 25000000L, 99.0), (2L, 1L, 100000000L, 30.0))
    // harness layout: ts is a nanos long (Tables.events does ts div 1000)
    val df = rows.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"),
        (col("us") * 1000).as("ts"), col("value"),
        lit("x").as("event_type"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("interp").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.qInterpolate(spark, dir)
      .filter(col("event_id") === 7L).collect().head
    assert(got.getAs[Any]("value_masked") == null)
    assert(math.abs(got.getAs[Double]("value_interp") - 15.0) < 1e-12)
  }

  test("tfidf: corpus-wide term present in every doc scores zero") {
    // a term with df == N has idf = ln(1) = 0, so its score must be 0
    val docs = Tables.documents(spark, sf001).count()
    val df = AnalyticsQueries.qTfidf(spark, sf001)
    val zeroIdf = df.filter(col("score") === 0.0)
    // any zero-score term must appear in all docs
    val terms = zeroIdf.select(col("term")).distinct().collect().map(_.getString(0))
    terms.foreach { t =>
      val docsWithTerm = Tables.documents(spark, sf001)
        .filter(array_contains(split(col("text"), " "), t)).count()
      assert(docsWithTerm == docs, s"term '$t' scored 0 but df=$docsWithTerm of $docs")
    }
  }

  test("tfidf plan: document frequency is a partial aggregate on term, never a window") {
    // a count().over(Window.partitionBy(term)) would pin every (doc,term)
    // row of a Zipf-frequent term onto ONE reducer at 100 TB; df must be
    // a map-side-combinable groupBy(term) joined back
    val plan = AnalyticsQueries.qTfidf(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(term"),
      s"df computed as a term-partitioned window:\n$plan")
    assert(plan.contains("HashAggregate(keys=[term"),
      s"no term-keyed aggregate for df in plan:\n$plan")
    // the only Window left is the per-doc top-k rank
    assert(plan.contains("windowspecdefinition(doc_id"), s"plan:\n$plan")
  }

  test("ntile approx: no window/total sort in plan; bins partition orders within sketch error of exact") {
    val sf1 = "/root/testdata/sf0.1"
    val plan = graft.queries.WindowQueries.qNtileApprox(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      s"approx tier must not use a window:\n$plan")
    val approx = graft.queries.WindowQueries.qNtileApprox(spark, sf1).collect()
      .map(r => r.getAs[Int]("decile") -> r.getAs[Long]("n")).toMap
    val exact = graft.queries.WindowQueries.qNtile(spark, sf1).collect()
      .map(r => r.getAs[Int]("decile") -> r.getAs[Long]("n")).toMap
    val total = exact.values.sum
    assert(approx.values.sum == total, "approx bins must partition all orders")
    assert(approx.keySet == (1 to 10).toSet, s"got bins ${approx.keySet}")
    // per-bin population within 1% of the exact decile (sketch accuracy
    // 10000 → rank error ~total/10000, far inside this bound)
    (1 to 10).foreach { d =>
      assert(math.abs(approx(d) - exact(d)) <= total / 100,
        s"bin $d: approx ${approx(d)} vs exact ${exact(d)}")
    }
  }

  test("funnel: stages are monotone non-increasing and bounded by user counts") {
    val r = AnalyticsQueries.qFunnel(spark, sf001).head()
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0)
    val distinctUsers = Tables.events(spark, sf001)
      .select(col("user_id")).distinct().count()
    assert(v <= distinctUsers)
  }

  test("range join: counts match a direct per-purchase filter on a sample") {
    val df = AnalyticsQueries.qRangeJoin(spark, sf001).cache()
    // every purchase appears exactly once
    val purchases = Tables.events(spark, sf001).filter(col("event_type") === "purchase")
    assert(df.count() == purchases.count())
    // brute-force check the 5 purchases with the highest counts
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us")).cache()
    val top = df.orderBy(col("n_clicks").desc, col("event_id")).limit(5).collect()
    top.foreach { r =>
      val pid = r.getAs[Long]("event_id")
      val pUs = ev.filter(col("event_id") === pid).head().getAs[Long]("us")
      val expected = ev.filter(col("event_type") === "click" &&
        abs(col("us") - lit(pUs)) <= 300000000L).count()
      assert(r.getAs[Long]("n_clicks") == expected, s"purchase $pid")
    }
    ev.unpersist(); df.unpersist()
  }

  test("range join: plan is a binned equi-join, not a nested-loop join") {
    val plan = AnalyticsQueries.qRangeJoin(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("attribution: one row per purchase; spot-check top counts against brute force") {
    val df = AnalyticsQueries.qAttribution(spark, sf001).cache()
    val ev = Tables.events(spark, sf001)
    assert(df.count() == ev.filter(col("event_type") === "purchase").count())
    val probe = ev.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us")).cache()
    df.orderBy(col("n_clicks").desc, col("event_id")).limit(5).collect().foreach { r =>
      val p = probe.filter(col("event_id") === r.getLong(0)).head()
      val expected = probe.filter(col("event_type") === "click" &&
        col("user_id") === p.getAs[Long]("user_id") &&
        col("us") >= p.getAs[Long]("us") - 1800000000L &&
        col("us") <= p.getAs[Long]("us")).count()
      assert(r.getLong(1) == expected, s"purchase ${r.getLong(0)}")
    }
    probe.unpersist(); df.unpersist()
  }

  test("window range: trailing-10min frame matches brute force on sampled rows") {
    val df = graft.queries.WindowQueries.qWindowRange(spark, sf001).cache()
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us")).cache()
    df.orderBy(col("n_10m").desc, col("event_id")).limit(5).collect().foreach { r =>
      val row = ev.filter(col("event_id") === r.getLong(0)).head()
      val expected = ev.filter(col("user_id") === row.getAs[Long]("user_id") &&
        col("us") >= row.getAs[Long]("us") - 600000000L &&
        col("us") <= row.getAs[Long]("us")).count()
      assert(r.getLong(3) == expected, s"event ${r.getLong(0)}")
    }
    // a frame always contains at least the current row
    assert(df.filter(col("n_10m") < 1).count() == 0)
    ev.unpersist(); df.unpersist()
  }

  test("resample+ffill: dense contiguous per-user grid, fill total and consistent") {
    val df = AnalyticsQueries.qResampleFfill(spark, sf001).cache()
    assert(df.count() > 0)
    // forward fill is total (first bucket is always observed) and agrees
    // with the bucket average wherever one exists
    assert(df.filter(col("value_ffill").isNull).count() == 0)
    assert(df.filter(col("bin_avg").isNotNull &&
      col("bin_avg") =!= col("value_ffill")).count() == 0)
    // grid density: per user, #rows == (max - min bucket + 1), no gaps
    val us = unix_micros(col("bucket_ts"))
    val spans = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(us).as("lo"), max(us).as("hi"))
      .filter(col("n") =!= (col("hi") - col("lo")) / 600000000L + 1)
    assert(spans.count() == 0, "grid has gaps or duplicates")
    df.unpersist()
  }

  test("group quantiles: ordered p25 <= p50 <= p75 within group min/max") {
    val q = AnalyticsQueries.qGroupQuantiles(spark, sf001)
    val bounds = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
    val bad = q.join(bounds, "l_returnflag")
      .filter(col("p25") > col("p50") || col("p50") > col("p75") ||
        col("p25") < col("lo") || col("p75") > col("hi"))
    assert(bad.count() == 0)
  }

  test("ntile: 10 bins partition all orders, bin ranges are disjoint and ordered") {
    val rows = graft.queries.WindowQueries.qNtile(spark, sf001).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf001).count())
    // bin sizes differ by at most 1 (NTILE contract)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    // hi of decile k <= lo of decile k+1
    rows.sortBy(_.getAs[Int]("decile")).sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }

  test("embedding stats: 10 labels x 64 dims, min <= mean <= max") {
    val rows = graft.queries.SimilarityQueries.qEmbeddingStats(spark, sf001).collect()
    assert(rows.length == 640)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("mean_val"))
      assert(r.getAs[Double]("mean_val") <= r.getAs[Double]("max_val"))
    }
  }

  test("retention: offset-0 user sum equals total distinct users; offsets non-negative") {
    val r = AnalyticsQueries.qRetention(spark, sf001).cache()
    assert(r.filter(col("week_offset") < 0).count() == 0)
    // every user is active in their own cohort week → offset-0 rows
    // partition all users exactly
    val week0 = r.filter(col("week_offset") === 0)
      .agg(sum(col("n_users"))).head().getLong(0)
    val users = Tables.events(spark, sf001).select(col("user_id")).distinct().count()
    assert(week0 == users, s"offset-0 sum $week0 != $users users")
    r.unpersist()
  }

  test("importance weights: target-language docs score higher; keep tracks the sign") {
    val w = AnalyticsQueries.qImportanceWeights(spark, sf001).cache()
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"))
    val byTarget = w.join(docs, Seq("doc_id"))
      .groupBy(col("lang") === AnalyticsQueries.DsirTargetLang)
      .agg(avg(col("avg_llr")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the weight is a target-vs-corpus likelihood ratio: the target
    // slice must sit above the rest on average — that separation IS
    // the operator's purpose
    assert(byTarget(true) > byTarget(false),
      s"target ${byTarget(true)} <= rest ${byTarget(false)}")
    assert(w.filter((col("avg_llr") > 0.0) =!= col("keep")).count() == 0)
    // every doc with at least one token is scored exactly once
    val nonEmpty = graft.text.TextAnalysis
      .withQualitySignals(Tables.documents(spark, sf001))
      .filter(col("n_tokens") > 0).count()
    assert(w.count() == nonEmpty)
    w.unpersist()
  }

  test("acf: correlations within [-1,1], pair counts complement the lag, lag-24 is the daily-rhythm probe") {
    val rows = AnalyticsQueries.qAcf(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 24))
    val nHours = graft.Tables.events(spark, sf001)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    // lead(k) pairs ROW t with row t+k of the hour-ordered frame, so
    // exactly n-k pairs exist regardless of calendar gaps
    rows.foreach { r =>
      assert(r.getLong(1) == nHours - r.getInt(0),
        s"lag ${r.getInt(0)}: ${r.getLong(1)} pairs vs $nHours hours")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12)
    }
  }

  test("graph bfs: seed at 0, hops contiguous from 0, every frontier vertex adjacent to the previous one") {
    val dist = AnalyticsQueries.qGraphBfs(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val edges = AnalyticsQueries.ringChordEdges(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val seed = edges.map(_._1).min
    assert(dist(seed) == 0 && dist.values.count(_ == 0) == 1)
    assert(dist.values.forall(d => d >= 0 && d <= 4))
    val hops = dist.values.toSet
    assert((0 to hops.max).forall(hops.contains), "hop levels must be contiguous")
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    // BFS invariant: a vertex at hop d>0 has a neighbor at hop d-1,
    // and none at anything smaller than d-1
    dist.foreach { case (v, dh) =>
      if (dh > 0) {
        val nd = adj(v).flatMap(dist.get)
        assert(nd.min == dh - 1, s"$v at $dh has neighbor hops ${nd.toSet}")
      }
    }
    // 4-hop truncation: any absent vertex must have no neighbor closer than hop 4
    val absent = adj.keySet.filterNot(dist.contains)
    absent.foreach { v =>
      assert(adj(v).flatMap(dist.get).forall(_ >= 4), s"$v unreached but near")
    }
  }

  test("grouped ols: per-user slope and r2 match an independent in-memory least-squares fit") {
    val out = AnalyticsQueries.qGroupedOls(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    val raw = graft.Tables.events(spark, sf001)
      .select(col("user_id"), expr("unix_micros(ts) div 1000000"),
        round(col("value") * lit(100)).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet == raw.keySet)
    raw.foreach { case (u, rows) =>
      // exact BigInt moments: the query gates NULL on EXACT integer
      // Δxx/Δyy, and x² ≈ 3e18 > 2^53 means a double recompute could
      // take the wrong branch (rounding residue where the exact Δ is 0)
      val n = BigInt(rows.length)
      val xs = rows.map(r => BigInt(r._2)); val ys = rows.map(r => BigInt(r._3))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      val (dxy, dxx, dyy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      val r = out(u)
      assert(r.getLong(1) == rows.length)
      if (rows.length >= 3 && dxx != 0) {
        val slope = (BigDecimal(dxy) / BigDecimal(dxx)).toDouble * 864.0
        assert(math.abs(r.getDouble(2) - slope) <=
          1e-6 * math.max(1.0, math.abs(slope)), s"slope user $u")
        if (dyy != 0) {
          val r2 = (BigDecimal(dxy * dxy) / BigDecimal(dxx * dyy)).toDouble
          assert(math.abs(r.getDouble(3) - r2) <= 1e-6, s"r2 user $u")
          assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-12)
        } else assert(r.isNullAt(3), s"constant-value user $u r2 must stay NULL")
      } else {
        assert(r.isNullAt(2), s"degenerate user $u slope must stay NULL")
        assert(r.isNullAt(3), s"degenerate user $u r2 must stay NULL")
      }
    }
  }

  test("ab test: per-type Welch z matches an independent in-memory two-sample computation") {
    val out = AnalyticsQueries.qAbTest(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val raw = graft.Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id") % 2,
        round(col("value") * lit(100)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet == raw.keySet)
    raw.foreach { case (t, rows) =>
      val a = rows.filter(_._2 == 0L).map(_._3.toDouble / 100.0)
      val b = rows.filter(_._2 == 1L).map(_._3.toDouble / 100.0)
      val r = out(t)
      assert(r.getLong(1) == a.length && r.getLong(2) == b.length)
      def meanOf(xs: Seq[Double]) = xs.sum / xs.length
      def varOf(xs: Seq[Double]) = {
        val m = meanOf(xs)
        xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      }
      if (a.length >= 2 && b.length >= 2) {
        val z = (meanOf(a) - meanOf(b)) /
          math.sqrt(varOf(a) / a.length + varOf(b) / b.length)
        assert(math.abs(r.getDouble(6) - z) <= 1e-9, s"$t: ${r.getDouble(6)} vs $z")
        assert(!r.isNullAt(7) && r.getBoolean(7) == (math.abs(r.getDouble(6)) > 1.96))
      } else assert(r.isNullAt(6) && r.isNullAt(7))
    }
  }

  test("seasonal outliers: every flagged hour violates the 3-MAD band; recompute from the decompose agrees") {
    val out = AnalyticsQueries.qSeasonalOutliers(spark, sf001).collect()
    assert(out.nonEmpty, "harness series must flag at least one hour")
    out.foreach { r =>
      val (resid, med, mad) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(resid - med) > 3.0 * mad)
    }
    // independent recompute over the decompose's residuals (exact
    // midpoint-of-sorted medians, same spelling)
    val resids = AnalyticsQueries.qSeasonalDecompose(spark, sf001)
      .filter(col("resid").isNotNull)
      .select(col("hour_ts").cast("string"), col("resid"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
    }
    val med = medianOf(resids.map(_._2))
    val mad = medianOf(resids.map(x => math.abs(x._2 - med)))
    val expected = resids.filter(x => math.abs(x._2 - med) > 3.0 * mad)
      .map(_._1).toSet
    assert(out.map(_.getTimestamp(0).toString.replaceAll("\\.0$", "")).toSet ==
      expected.map(_.replaceAll("\\.0$", "")).toSet)
  }

  test("chi2 independence: cells recompute from raw counts; margin deviations cancel exactly") {
    val out = AnalyticsQueries.qChi2Independence(spark, sf001).collect()
    val raw = graft.Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id") % 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val obs = raw.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = raw.length.toLong
    val rTot = raw.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cTot = raw.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet == obs.keySet)
    out.foreach { r =>
      val (t, c, o) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(o == obs((t, c)))
      val rc = BigInt(rTot(t)) * BigInt(cTot(c))
      val dev = BigInt(n) * BigInt(o) - rc
      val expd = rc.toDouble / n
      assert(math.abs(r.getDouble(3) - expd) <= 1e-9 * math.max(1.0, expd))
      val contrib = dev.toDouble * dev.toDouble / (n.toDouble * rc.toDouble)
      assert(math.abs(r.getDouble(4) - contrib) <= 1e-9 * math.max(1.0, contrib))
      assert(r.getDouble(4) >= 0.0)
      val sr = dev.toDouble / (n.toDouble * math.sqrt(rc.toDouble / n))
      assert(math.abs(r.getDouble(5) - sr) <= 1e-9)
      // std_resid² recovers the cell contribution (the χ² identity)
      assert(math.abs(sr * sr - contrib) <= 1e-6 * math.max(1.0, contrib))
    }
    // each margin's integer deviations cancel EXACTLY: Σ_j (N·O − R·C) = 0
    rTot.keys.foreach { t =>
      val s = cTot.keys.map(c =>
        BigInt(n) * BigInt(obs((t, c))) - BigInt(rTot(t)) * BigInt(cTot(c))).sum
      assert(s == 0, s"margin $t")
    }
  }

  test("PSI drift: terms recompute from raw cohort counts; smoothed shares sum to 1") {
    val out = AnalyticsQueries.qPsiDrift(spark, sf001).collect()
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val raw = graft.Tables.events(spark, sf001)
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"))
      .collect().flatMap { r =>
        val cur = if (r.getTimestamp(0).before(cut)) 0 else 1
        val bin = math.min(math.round(r.getDouble(2) * 100) / 5000, 9L).toString
        Seq((cur, "value_bin", bin), (cur, "event_type", r.getString(1)))
      }
    val counts = raw.groupBy(t => (t._2, t._3))
      .map { case (k, v) => k -> (v.count(_._1 == 0).toLong, v.count(_._1 == 1).toLong) }
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == counts.keySet)
    val byFeature = counts.groupBy(_._1._1)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (nRef, nCur) = counts(key)
      assert(r.getLong(2) == nRef && r.getLong(3) == nCur, s"counts $key")
      val bins = byFeature(key._1)
      val b = bins.size.toLong
      val totRef = bins.valuesIterator.map(_._1).sum
      val totCur = bins.valuesIterator.map(_._2).sum
      val pRef = (nRef + 1).toDouble / (totRef + b)
      val pCur = (nCur + 1).toDouble / (totCur + b)
      assert(r.getDouble(4) == pRef && r.getDouble(5) == pCur, s"shares $key")
      val term = BigDecimal((pCur - pRef) * math.log(pCur / pRef))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(6) - term) <= 1e-9, s"psi term $key")
      assert(java.lang.Double.isFinite(r.getDouble(6)), s"non-finite term $key")
    }
    // Laplace closure: Σ (k+1)/(tot+B) over OBSERVED bins = 1 exactly
    out.groupBy(_.getString(0)).foreach { case (f, rows) =>
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12, s"$f p_ref")
      assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-12, s"$f p_cur")
    }
  }

  test("rolling active users: every day's WAU equals the exact trailing-7-day distinct count") {
    val out = AnalyticsQueries.qRollingActiveUsers(spark, sf001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val raw = graft.Tables.events(spark, sf001)
      .select(to_date(col("ts")).as("d"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val (dmin, dmax) = (raw.map(_._1).min, raw.map(_._1).max)
    // DENSE calendar series: one row per day of the span, no holes
    val span = Iterator.iterate(dmin)(_.plusDays(1))
      .takeWhile(!_.isAfter(dmax)).toSeq
    assert(out.map(_._1).toSeq == span,
      "output must be the dense observed span")
    val byDay = out.toMap
    span.foreach { day =>
      val expect = raw.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._2).distinct.length.toLong
      assert(byDay(day) == expect, s"day $day: ${byDay(day)} vs $expect")
    }
  }

  test("basket rules: confidence and lift recompute from raw supports; lift identity holds") {
    val out = AnalyticsQueries.qBasketRules(spark, sf001).collect()
    assert(out.length == 20)
    val kept = graft.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .flatMap { case (ok, ps) =>
        ps.map(_._2).distinct.sorted.take(AnalyticsQueries.BasketCap)
          .map(ok -> _)
      }
    val item = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nB = kept.map(_._1).distinct.length.toLong
    val pairSupport = kept.groupBy(_._1).values.flatMap { b =>
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the 20 returned pairs must be the TRUE top-20 by (support, a, b)
    val top20 = pairSupport.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(20).map(_._1)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == top20,
      "returned pairs are not the top-20 by support")
    out.foreach { r =>
      val (a, b, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(np == pairSupport((a, b)), s"pair ($a,$b) support")
      // truncation visibility: no harness basket exceeds the cap
      assert(r.getLong(8) == 0L, "unexpected capped baskets on harness data")
      assert(r.getLong(3) == item(a) && r.getLong(4) == item(b))
      assert(r.getDouble(5) == np.toDouble / item(a))
      assert(r.getDouble(6) == np.toDouble / item(b))
      val lift = (nB * np).toDouble / (item(a) * item(b))
      assert(r.getDouble(7) == lift, s"pair ($a,$b) lift")
      // identity: lift == conf(a→b) / P(b)
      assert(math.abs(lift - r.getDouble(5) / (item(b).toDouble / nB)) <= 1e-12)
    }
  }

  test("event markov: transitions recompute from ordered streams; rows sum to 1; counts conserve") {
    val out = AnalyticsQueries.qEventMarkov(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().groupBy(_.getLong(0))
    val expect = ev.values.flatMap { es =>
      val sorted = es.sortBy(r =>
        (r.getTimestamp(1).getTime, r.getTimestamp(1).getNanos, r.getLong(2)))
        .map(_.getString(3))
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.map(_._1).toSet == expect.keySet)
    out.foreach { case (k, (n, p)) =>
      assert(n == expect(k), s"transition $k count")
      val rowTot = expect.filter(_._1._1 == k._1).values.sum
      assert(p == n.toDouble / rowTot, s"transition $k probability")
    }
    // each row of the matrix is a distribution; total transitions =
    // total events minus one per user with >= 1 event
    out.groupBy(_._1._1).foreach { case (cur, rows) =>
      assert(math.abs(rows.map(_._2._2).sum - 1.0) < 1e-12, s"row $cur")
    }
    val nTrans = out.map(_._2._1).sum
    val nEvents = ev.values.map(_.length).sum
    assert(nTrans == nEvents - ev.size, "transition count must conserve the stream")
  }

  test("survival hazard: at-risk ladder conserves the signup cohort; hazards recompute") {
    val out = AnalyticsQueries.qSurvivalHazard(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"), col("ts").cast("timestamp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min(Ordering.by((t: java.sql.Timestamp) => (t.getTime, t.getNanos))))
      .toMap
    val tmax = ev.map(_._3).maxBy(_.getTime)
    // derive the calendar day in UTC explicitly — toLocalDateTime would
    // render in the host JVM's default zone, silently diverging from
    // the query's UTC-session date cast on a non-UTC machine
    def day(t: java.sql.Timestamp) =
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    // t0.toSeq first: mapping a Map with a pair-valued function would
    // rebuild a Map keyed by day and silently collapse duplicate rows
    val obs = t0.toSeq.map { case (u, s0) =>
      // full timestamp precision (getTime truncates to millis — the
      // microsecond-order lesson from the streaming replay specs)
      val conv = ev.filter(e => e._1 == u && e._2 == "purchase" &&
        e._3.compareTo(s0) > 0).map(_._3)
      if (conv.nonEmpty) {
        val tp = conv.minBy(t => (t.getTime, t.getNanos))
        (java.time.temporal.ChronoUnit.DAYS.between(day(s0), day(tp)), true)
      } else
        (java.time.temporal.ChronoUnit.DAYS.between(day(s0), day(tmax)), false)
    }.toSeq
    val grid = obs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      (t, rows.count(_._2).toLong, rows.count(!_._2).toLong)
    }
    assert(out.length == grid.length && out.nonEmpty)
    var risk = obs.length.toLong
    out.zip(grid).foreach { case ((t, nr, de, ce, hz), (et, ed, ec)) =>
      assert(t.toLong == et && de == ed && ce == ec, s"day $t grid")
      assert(nr == risk, s"day $t at-risk ladder")
      assert(hz == de.toDouble / nr, s"day $t hazard")
      risk -= de + ce
    }
    assert(risk == 0, "ladder must exhaust the cohort exactly")
  }

  test("lagged cross-correlation recomputes from the raw hourly series") {
    val out = AnalyticsQueries.qXcorrLagged(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(out.map(_._1) == (-3 to 3).toSeq, "one row per lag, ordered")
    // rebuild the observed hourly (x, y) series driver-side
    val hourly = graft.Tables.events(spark, sf001)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"), col("value"))
      .collect().groupBy(_.getTimestamp(0)).toSeq.sortBy(_._1.getTime)
      .map { case (_, rows) =>
        (rows.count(_.getString(1) == "error").toLong,
          rows.filter(_.getString(1) == "purchase")
            .map(r => math.round(r.getDouble(2) * 100)).sum)
      }
    val n = hourly.length
    def corr(ps: Seq[(Long, Long)]): Option[Double] = {
      val m = ps.length.toLong
      val (sx, sy) = (ps.map(p => BigInt(p._1)).sum, ps.map(p => BigInt(p._2)).sum)
      val sxy = ps.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val sxx = ps.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = ps.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val (vx, vy) = (m * sxx - sx * sx, m * syy - sy * sy)
      if (vx == 0 || vy == 0) None
      else Some((m * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
    }
    out.foreach { case (k, np, r) =>
      assert(np == n - math.abs(k), s"n_pairs at lag $k")
      val ps =
        if (k >= 0) (0 until n - k).map(t => (hourly(t)._1, hourly(t + k)._2))
        else (0 until n + k).map(t => (hourly(t - k)._1, hourly(t)._2))
      (r, corr(ps)) match {
        case (Some(g), Some(e)) =>
          assert(math.abs(g - e) <= 1e-12, s"lag $k: $g vs $e")
          assert(g >= -1.0 - 1e-12 && g <= 1.0 + 1e-12)
        case (None, None) => // degenerate lag on both sides
        case (g, e) => fail(s"lag $k: null mismatch $g vs $e")
      }
    }
  }

  test("best-of-n: selection is the exact per-prompt argmax, margin and band recompute") {
    val out = AnalyticsQueries.qBestOfN(spark, sf001).collect()
    val nPrompts = Tables.documents(spark, sf001).count()
    assert(out.length == nPrompts)
    def ru(p: Long, i: Long): Long =
      (p * 8 + i) % 1000003L * 2654435761L % 1000000L
    out.foreach { r =>
      val p = r.getAs[Long]("prompt_id")
      val cands = (0L until 8L).map(i => (ru(p, i), i))
      // brute-force: reward desc, cand asc
      val sorted = cands.sortBy { case (u, i) => (-u, i) }
      val (u1, c1) = sorted.head
      val (u2, _) = sorted(1)
      assert(r.getAs[Long]("best_cand") == c1, s"prompt $p argmax")
      assert(r.getAs[Double]("reward") == u1.toDouble / 1e6)
      assert(r.getAs[Double]("margin") == (u1 - u2).toDouble / 1e6)
      assert(r.getAs[Long]("margin_band") == (u1 - u2) / 100000L)
    }
    // the histogram re-counts the same frame
    val hist = AnalyticsQueries.qBestOfNHist(spark, sf001).collect()
      .map(r => r.getAs[Long]("margin_band") -> r.getAs[Long]("n_prompts"))
      .toMap
    val expected = out.groupBy(_.getAs[Long]("margin_band"))
      .map { case (b, rs) => b -> rs.length.toLong }
    assert(hist == expected)
  }

  test("dpo pairs: chosen/rejected are the exact per-prompt extremes; gap and verdict recompute") {
    val out = AnalyticsQueries.qDpoPairs(spark, sf001).collect()
    assert(out.length == Tables.documents(spark, sf001).count())
    def ru(p: Long, i: Long): Long =
      (p * 8 + i) % 1000003L * 2654435761L % 1000000L
    out.foreach { r =>
      val p = r.getAs[Long]("prompt_id")
      val cands = (0L until 8L).map(i => (ru(p, i), i))
      val (uc, cc) = cands.sortBy { case (u, i) => (-u, i) }.head
      val (ur, cr) = cands.sortBy { case (u, i) => (u, i) }.head
      assert(r.getAs[Long]("chosen_cand") == cc)
      assert(r.getAs[Long]("rejected_cand") == cr)
      assert(r.getAs[Double]("reward_chosen") == uc.toDouble / 1e6)
      assert(r.getAs[Double]("reward_rejected") == ur.toDouble / 1e6)
      assert(r.getAs[Double]("reward_gap") == (uc - ur).toDouble / 1e6)
      assert(r.getAs[Boolean]("confident") == (uc - ur >= 300000L))
    }
    // fixture sanity: confident pairs occur (the per-row loop above
    // already proves the verdict derivation for BOTH branches; the
    // harness fixture's max-min gap of 8 uniform draws lands below
    // 0.3 with probability ~8·0.3⁷ ≈ 0.002 per prompt, so a false
    // instance is not a fixture guarantee)
    assert(out.exists(_.getAs[Boolean]("confident")))
  }
}
