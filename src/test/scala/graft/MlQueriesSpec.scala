package graft

import org.apache.spark.sql.functions._
import graft.queries.MlQueries

class MlQueriesSpec extends SparkSpec {

  test("indexed features: StringIndexer mapping == count-desc/value-asc dense rank") {
    val out = MlQueries.qMlIndexedFeatures(spark, sf001).collect()
    // independently derive the frequencyDesc contract from raw counts
    val counts = Tables.events(spark, sf001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val expected = counts.sortBy { case (v, n) => (-n, v) }.zipWithIndex
      .map { case ((v, n), i) => v -> ((i.toDouble, n)) }.toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      val (idx, n) = expected(r.getString(0))
      assert(r.getDouble(1) == idx,
        s"${r.getString(0)}: index ${r.getDouble(1)} != $idx")
      assert(r.getLong(2) == n)
    }
    // indices are a 0-based permutation
    assert(out.map(_.getDouble(1)).sorted.toSeq ==
      (0 until out.length).map(_.toDouble))
  }

  test("onehot: one row per event, at most one hot slot, dropLast category all-zero") {
    val out = MlQueries.qMlOnehot(spark, sf001).cache()
    assert(out.count() == Tables.events(spark, sf001).count())
    val hot = out.withColumn("ones",
      col("c0") + col("c1") + col("c2") + col("c3"))
    assert(hot.filter(col("ones") > 1.0).count() == 0, "more than one hot slot")
    // the least frequent category (index 4, dropped) encodes all-zero;
    // every other category has exactly one hot slot
    val zeroTypes = hot.filter(col("ones") === 0.0)
      .select(col("event_type")).distinct().collect().map(_.getString(0))
    assert(zeroTypes.length == 1, s"exactly one all-zero category: ${zeroTypes.toSeq}")
    val leastFrequent = Tables.events(spark, sf001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").asc, col("event_type").desc)
      .head().getString(0)
    assert(zeroTypes.head == leastFrequent)
    out.unpersist()
  }

  test("onehot slot count follows the fitted model: 3 categories → 2 indicator columns") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("event_id", "event_type")
    val out = MlQueries.onehotIndicators(df, Seq("event_id", "event_type"), "event_type")
    assert(out.columns.toSeq == Seq("event_id", "event_type", "c0", "c1"))
    val byType = out.collect()
      .map(r => r.getString(1) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    // frequencyDesc: a→slot 0, b→slot 1, c→index 2 = dropped (all-zero)
    assert(byType("a") == ((1.0, 0.0)))
    assert(byType("b") == ((0.0, 1.0)))
    assert(byType("c") == ((0.0, 0.0)))
  }

  test("bucketize: counts cover the table, means sit inside their bucket bounds") {
    val out = MlQueries.qMlBucketize(spark, sf001).collect()
    val total = graft.Tables.lineitem(spark, sf001).count()
    assert(out.map(_.getLong(1)).sum == total, "every row lands in exactly one bucket")
    val bounds = Seq((Double.MinValue, 1000.0), (1000.0, 5000.0),
      (5000.0, 20000.0), (20000.0, 50000.0), (50000.0, Double.MaxValue))
    out.foreach { r =>
      val (lo, hi) = bounds(r.getInt(0))
      val m = r.getDouble(2)
      assert(m >= lo && m < hi, s"bucket ${r.getInt(0)} mean $m outside [$lo,$hi)")
    }
  }

  test("target encode: smoothed means and LOO band match an in-memory recount; shrinkage pulls toward the prior") {
    val out = MlQueries.qTargetEncode(spark, sf001).collect()
    val raw = Tables.events(spark, sf001)
      .select(col("event_type"), hour(col("ts")), round(col("value") * lit(100)).cast("long"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nAll = raw.valuesIterator.map(_.length.toLong).sum
    val sAll = raw.valuesIterator.map(_.sum).sum
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSet == raw.keySet)
    out.foreach { r =>
      val cs = raw((r.getString(0), r.getInt(1)))
      val (n, s) = (cs.length.toLong, cs.sum)
      assert(r.getLong(2) == n)
      def enc(num: Double, den: Double) = num / den / 100.0
      assert(r.getDouble(3) ==
        enc((nAll * s + 20 * sAll).toDouble, (nAll * (n + 20)).toDouble))
      if (n >= 2) {
        assert(r.getDouble(4) ==
          enc((nAll * (s - cs.max) + 20 * sAll).toDouble, (nAll * (n - 1 + 20)).toDouble))
        assert(r.getDouble(5) ==
          enc((nAll * (s - cs.min) + 20 * sAll).toDouble, (nAll * (n - 1 + 20)).toDouble))
        assert(r.getDouble(4) <= r.getDouble(5))
      }
      // m-estimate shrinkage: the encoding sits strictly between the
      // raw group mean and the global prior (when they differ)
      val prior = sAll.toDouble / nAll / 100.0
      val rawMean = s.toDouble / n / 100.0
      if (math.abs(rawMean - prior) > 1e-9)
        assert((r.getDouble(3) - rawMean) * (r.getDouble(3) - prior) < 0,
          s"enc must lie between group mean $rawMean and prior $prior")
    }
  }

  test("calibration bins: partition the test set, stay in their decile intervals, and the bounds row reads all-true") {
    val cal = graft.queries.ExtraQueries.qMlCalibration(spark, sf001).collect()
    assert(cal.nonEmpty)
    assert(cal.map(_.getInt(0)).toSeq == cal.map(_.getInt(0)).toSeq.sorted)
    cal.foreach { r =>
      val (bin, n, frac, meanP) =
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(bin >= 0 && bin <= 9 && n >= 1)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(meanP >= bin / 10.0 &&
        (meanP < (bin + 1) / 10.0 || (bin == 9 && meanP <= 1.0)),
        s"bin $bin mean_p $meanP outside its interval")
    }
    val b = graft.queries.ExtraQueries.qMlCalibrationBounds(spark, sf001).head()
    (0 until 4).foreach(i => assert(b.getBoolean(i), s"bounds col $i"))
  }

  test("exact AUC: Mann-Whitney midrank identity agrees with mllib's trapezoid areaUnderROC") {
    val row = MlQueries.qAucExact(spark, sf001).collect()(0)
    val (nPos, nNeg, auc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val scoreAndLabels = Tables.events(spark, sf001)
      .select(round(col("value") * lit(100)).cast("double"),
        when(col("event_type") === "purchase", 1.0).otherwise(0.0))
      .rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    val metrics =
      new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(scoreAndLabels)
    // trapezoid-over-score-grouped-thresholds and midrank Mann-Whitney
    // are the same estimator; only float summation order differs
    assert(math.abs(auc - metrics.areaUnderROC()) <= 1e-12,
      s"$auc vs mllib ${metrics.areaUnderROC()}")
    val total = Tables.events(spark, sf001).count()
    assert(nPos + nNeg == total && nPos > 0 && nNeg > 0)
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
