package graft

import org.apache.spark.sql.functions._

import graft.text.QualityModel

/** The learned quality classifier's contract: the hashed-ngram
  * featurizer produces exactly unigrams + adjacent bigrams, the
  * broadcast-weight scoring path is the linear model it claims to be
  * (bias-only model ⇒ constant score; docs with no terms keep the
  * bias), and the fit distills the heuristic rater well above the
  * gate floor. */
class QualityModelSpec extends SparkSpec {

  test("termBuckets: unigrams + adjacent bigrams, empty docs drop out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), // 3 unigrams + 2 bigrams = 5 terms
      (2L, "alpha"),            // 1 unigram, no bigram
      (3L, " "),                // tokenizes to nothing
      (4L, "alpha alpha")       // 2 unigrams + 1 bigram (counts merge)
    ).toDF("doc_id", "text")
    val tb = QualityModel.termBuckets(docs)
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("mass"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(tb(1L) === 5.0)
    assert(tb(2L) === 1.0)
    assert(!tb.contains(3L), "whitespace-only doc must emit no terms")
    assert(tb(4L) === 3.0)
  }

  test("scoreWith is the linear model: bias-only weights give every doc the bias") {
    import spark.implicits._
    val lab = Seq((1L, "alpha beta", 1, false), (2L, "", 0, true))
      .toDF("doc_id", "text", "label", "is_holdout")
    val f = QualityModel.Fit(Array.fill(QualityModel.Dim)(0.0), 1.5,
      Double.NaN, 1L, 1L)
    val out = QualityModel.scoreWith(spark, lab, f)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 1.5, "zero weights: score must collapse to bias")
    assert(out(2L) === 1.5, "no-term doc must keep the bias (left join)")
  }

  test("fit distills the heuristic rater: holdout AUC well above the gate floor") {
    val f = QualityModel.fit(spark, sf001)
    assert(f.weights.length === QualityModel.Dim)
    assert(f.nTrain > 0 && f.nHold > 0)
    assert(f.auc >= 0.9, s"holdout AUC ${f.auc} — gate floor is 0.75, " +
      "spec pins the measured ≥0.9 band")
  }
}
