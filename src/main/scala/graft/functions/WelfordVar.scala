package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically stable one-pass mean/variance as a typed
  * [[Aggregator]] — the `Dataset`-API member of the custom-aggregate
  * family (TopKBy and KllSketch cover the DataFrame/Catalyst side as
  * TypedImperativeAggregates; this shows the Encoders path a typed
  * pipeline uses with `groupByKey(...).agg(agg.toColumn)`).
  *
  * Welford's recurrence with the pairwise merge of Chan, Golub &
  * LeVeque (1983): the buffer carries (n, mean, M2 = Σ(x−mean)²) and
  * merges exactly the way map-side partial aggregation needs —
  * associative, commutative, no order sensitivity beyond float
  * rounding. The textbook E[x²]−E[x]² spelling cancels
  * catastrophically when stddev ≪ |mean| (a sensor biased at 1e8
  * with unit noise loses ALL variance digits in doubles); M2 never
  * subtracts two large near-equal sums, so precision tracks the
  * data's spread, not its offset. WelfordSpec plants exactly that
  * offset case and checks Welford against the shifted ground truth
  * while the naive spelling visibly collapses.
  */
final case class WelfordState(n: Long, mean: Double, m2: Double)

/** @param get extracts the measured value from the input row type. */
final class WelfordVar[IN](get: IN => Double)
    extends Aggregator[IN, WelfordState, WelfordState] {

  override def zero: WelfordState = WelfordState(0L, 0.0, 0.0)

  override def reduce(b: WelfordState, row: IN): WelfordState = {
    val x = get(row)
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordState(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: WelfordState, b: WelfordState): WelfordState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordState(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }
  }

  override def finish(r: WelfordState): WelfordState = r

  override def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  override def outputEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
}

object WelfordVar {
  /** Sample variance off a finished state: None for n < 2 — the same
    * undefined-not-zero convention as var_samp/stddev_samp's NULL (and
    * as qGroupedVariance's guarded column), so a singleton group can
    * never masquerade as a zero-variance one. */
  def sampleVariance(s: WelfordState): Option[Double] =
    if (s.n < 2) None else Some(s.m2 / (s.n - 1))

  def sampleStddev(s: WelfordState): Option[Double] =
    sampleVariance(s).map(math.sqrt)
}
