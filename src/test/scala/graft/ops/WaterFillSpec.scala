package graft.ops

import graft.SparkSpec
import graft.queries.ExtraQueries

class WaterFillSpec extends SparkSpec {

  import spark.implicits._

  /** Iterative fixpoint reference: repeatedly saturate every source
    * whose availability is at or below its weighted share of the
    * remaining budget, until no new source saturates. The textbook
    * definition waterFill's sorted-prefix closed form must equal. */
  private def reference(av: Seq[(String, Long, Long)], num: Long, den: Long)
      : Map[String, (Boolean, Long)] = {
    val b = av.map(_._2).sum * num / den
    var sat = Set.empty[String]
    var changed = true
    while (changed) {
      val rb = b - av.filter(x => sat(x._1)).map(_._2).sum
      val rw = av.filterNot(x => sat(x._1)).map(_._3).sum
      val newly = av.filterNot(x => sat(x._1))
        .filter { case (_, a, w) => a * rw <= w * rb }.map(_._1)
      changed = newly.nonEmpty
      sat ++= newly
    }
    val rb = b - av.filter(x => sat(x._1)).map(_._2).sum
    val rw = av.filterNot(x => sat(x._1)).map(_._3).sum
    av.map { case (s, a, w) =>
      s -> (if (sat(s)) (true, a) else (false, w * rb / rw))
    }.toMap
  }

  private def run(av: Seq[(String, Long, Long)], num: Long, den: Long)
      : Map[String, (Boolean, Long)] = {
    // one row per available token so waterFill's corpus aggregate is
    // exercised (weights come from the map, availability from rows)
    val rows = av.flatMap { case (s, a, _) => if (a == 0) Nil else Seq((s, a)) }
    val df =
      if (rows.isEmpty) Seq.empty[(String, Long)].toDF("source", "n")
      else rows.toDF("source", "n")
    DomainMix.waterFill(df, "source", "n",
        av.map(x => x._1 -> x._3).toMap, num, den)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Boolean]("saturated"), r.getAs[Long]("allocated"))))
      .toMap
  }

  test("planted: small sources saturate, the rest split the remainder by weight") {
    // avail (a, w): A=(10,1) r=10, B=(100,1) r=100, C=(1000,2) r=500;
    // budget 3/5 of 1110 = 666. A saturates (10 <= 1*?): check ref.
    val av = Seq(("A", 10L, 1L), ("B", 100L, 1L), ("C", 1000L, 2L))
    val got = run(av, 3, 5)
    assert(got == reference(av, 3, 5))
    assert(got("A") == ((true, 10L)))
    // remaining 656 split 1:2 across B and C -> B=218, C=437 floored
    assert(got("B") == ((true, 100L)) || got("B")._2 == 656 / 3,
      s"B allocation surprising: $got")
  }

  test("budget >= total availability saturates everything") {
    val av = Seq(("A", 5L, 3L), ("B", 7L, 1L))
    val got = run(av, 1, 1) // budget = exactly the total
    assert(got.values.forall(_._1), s"all saturated expected: $got")
    assert(got("A")._2 == 5L && got("B")._2 == 7L)
  }

  test("zero-availability source stays on the spine, saturated at 0") {
    val av = Seq(("A", 0L, 17L), ("B", 100L, 1L))
    val got = run(av, 1, 2)
    assert(got("A") == ((true, 0L)))
    assert(got("B") == ((false, 50L))) // water level 50/1, B unsaturated
  }

  test("randomized: closed form == iterative fixpoint; budget invariants hold") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { i =>
      val n = 1 + rnd.nextInt(8)
      val av = (0 until n).map { j =>
        (s"s$j", rnd.nextInt(1000).toLong, 1L + rnd.nextInt(17).toLong)
      }
      val (num, den) = (1L + rnd.nextInt(5).toLong, 1L + rnd.nextInt(5).toLong)
      val got = run(av, num, den)
      val ref = reference(av, num, den)
      assert(got == ref, s"case $i: av=$av budget=$num/$den\n got=$got\n ref=$ref")
      val b = av.map(_._2).sum * num / den
      val alloc = got.values.map(_._2).sum
      val nUnsat = got.values.count(!_._1)
      if (nUnsat == 0) assert(alloc == math.min(b, av.map(_._2).sum) || b >= av.map(_._2).sum)
      else {
        assert(alloc <= b, s"case $i overspends: $alloc > $b")
        assert(b - alloc < nUnsat, s"case $i floor shortfall too big")
      }
      got.foreach { case (s, (_, x)) =>
        val a = av.find(_._1 == s).get._2
        assert(x >= 0 && x <= a, s"case $i: $s allocated $x of $a")
      }
    }
  }

  test("selection: per-source intake fits the allocation; saturated sources take everything") {
    val alloc = ExtraQueries.qMixWaterfill(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Boolean]("saturated"), r.getAs[Long]("allocated")))).toMap
    val sel = ExtraQueries.qMixWaterfillSelect(spark, sf001).collect()
    val bySource = sel.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    bySource.foreach { case (s, taken) =>
      assert(taken <= alloc(s)._2, s"$s intake $taken > allocation ${alloc(s)._2}")
    }
    // a saturated source's whole corpus is selected (every token taken)
    val avail = ExtraQueries.qMixWaterfill(spark, sf001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("available")).toMap
    alloc.filter(_._2._1).foreach { case (s, (_, a)) =>
      assert(bySource.getOrElse(s, 0L) == a && a == avail(s),
        s"saturated $s must take all $a tokens, took ${bySource.getOrElse(s, 0L)}")
    }
  }

  test("epochs: saturated sources read exactly 4000 permille; nothing exceeds the cap") {
    val rows = ExtraQueries.qMixEpochs(spark, sf001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (sat, ep) = (r.getAs[Boolean]("saturated"), r.getAs[Long]("epochs_x1000"))
      val (ct, tt) = (r.getAs[Long]("corpus_tokens"), r.getAs[Long]("train_tokens"))
      assert(ep <= 4000L, s"epoch cap broken: $r")
      assert(r.getAs[Long]("capacity") == 4L * ct)
      if (sat && ct > 0) assert(ep == 4000L && tt == 4L * ct, s"saturated row off-cap: $r")
    }
    assert(rows.exists(_.getAs[Boolean]("saturated")))
    assert(rows.exists(r => !r.getAs[Boolean]("saturated")))
  }

  test("q_mix_waterfill: both saturated and unsaturated sources present at sf0.001") {
    val out = ExtraQueries.qMixWaterfill(spark, sf001).collect()
    assert(out.length == 20) // full frozen spine
    assert(out.exists(_.getAs[Boolean]("saturated")))
    assert(out.exists(!_.getAs[Boolean]("saturated")))
  }
}
