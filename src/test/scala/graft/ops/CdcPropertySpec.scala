package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-based check for [[Cdc.foldVersioned]] (plain scalacheck
  * with fixed seeds — the scalatestplus bridge isn't in the offline
  * dependency cache): for random change logs, random partitions into
  * batches, and random batch arrival orders, the folded state must
  * equal the one-shot collapse of the whole log, and both must equal
  * a trusted in-memory latest-wins reduction. This is the convergence
  * claim the streaming face relies on (out-of-order triggers,
  * straggler replays) stated as a law, not an example. */
class CdcPropertySpec extends SparkSpec {

  private type Chg = (Long, String, Double, Int) // key, op, payload, seq

  /** Trusted reference: per key, the change with the max seq wins
    * (seqs are made unique per key by the generator, so the order is
    * total and "latest" is unambiguous). */
  private def reference(log: Seq[Chg]): Map[Long, (String, Double, Int)] =
    log.groupBy(_._1).map { case (k, cs) =>
      val w = cs.maxBy(_._4)
      k -> ((w._2, w._3, w._4))
    }

  // log with unique (key, seq): 1-24 changes over keys 0-5, ops biased
  // toward upserts, seq drawn without replacement per key
  private val logGen: Gen[List[Chg]] =
    Gen.choose(1, 24).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.choose(0L, 5L)
        op <- Gen.frequency(3 -> Gen.const("u"), 1 -> Gen.const("d"))
        v <- Gen.choose(0, 999)
      } yield (k, op, v.toDouble, 0))
    }.map { raw =>
      // make seq unique per key (position-based) so the version order
      // is total — the operator's documented precondition
      raw.zipWithIndex.map { case ((k, op, v, _), i) => (k, op, v, i) }
    }

  private def shuffle[A](xs: List[A], seed: Long): List[A] =
    new scala.util.Random(seed).shuffle(xs)

  test("random logs, random batchings, random orders: fold == collapse == reference") {
    import spark.implicits._
    val empty = Seq.empty[Chg].toDF("k", "op", "bal", "seq")
    (1 to 8).foreach { i =>
      val log = logGen(Gen.Parameters.default, Seed(i.toLong)).get
      // random partition into 1-4 batches, then a shuffled arrival order
      val nB = 1 + (i % 4)
      val batches = shuffle(
        log.groupBy(c => c._4 % nB).values.toList.map(b =>
          b.toDF("k", "op", "bal", "seq")),
        seed = i * 31L)
      val folded = batches.foldLeft(empty)((st, b) =>
        Cdc.foldVersioned(st, b, "k", "op", Seq("seq"), Seq("bal")))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getInt(3)))).toMap
      val oneShot = Cdc.foldVersioned(empty, log.toDF("k", "op", "bal", "seq"),
          "k", "op", Seq("seq"), Seq("bal"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getInt(3)))).toMap
      val expect = reference(log)
      assert(folded == expect, s"seed=$i fold != reference\n$folded\n$expect")
      assert(oneShot == expect, s"seed=$i one-shot != reference")
    }
  }

  test("live view after random folds == reference minus tombstones") {
    import spark.implicits._
    val empty = Seq.empty[Chg].toDF("k", "op", "bal", "seq")
    (20 to 24).foreach { i =>
      val log = logGen(Gen.Parameters.default, Seed(i.toLong)).get
      val state = Cdc.foldVersioned(empty, log.toDF("k", "op", "bal", "seq"),
        "k", "op", Seq("seq"), Seq("bal"))
      val live = Cdc.live(state, "op").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val expect = reference(log).collect { case (k, ("u", v, _)) => k -> v }
      assert(live == expect, s"seed=$i live=$live expect=$expect")
    }
  }
}
