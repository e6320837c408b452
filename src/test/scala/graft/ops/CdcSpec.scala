package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcSpec extends SparkSpec {

  private def run(baseRows: Seq[(Long, String, Double)],
                  logRows: Seq[(Long, String, Double, Int)]) = {
    import spark.implicits._
    val base = baseRows.toDF("k", "name", "bal")
    val log = logRows.toDF("k", "op", "bal", "seq")
    Cdc.apply(base, log, "k", "op", Seq("seq"), Seq("bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
  }

  test("upsert overwrites payload, delete removes, untouched survives") {
    val got = run(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)),
      Seq((1L, "u", 99.0, 1), (2L, "d", 0.0, 1)))
    assert(got == Map(1L -> ("a", 99.0), 3L -> ("c", 30.0)))
  }

  test("latest change per key wins under the version order") {
    val got = run(
      Seq((1L, "a", 10.0)),
      Seq((1L, "u", 50.0, 1), (1L, "d", 0.0, 2), (1L, "u", 70.0, 3)))
    assert(got == Map(1L -> ("a", 70.0)))
    // ...and a delete that IS last deletes despite earlier upserts
    val del = run(Seq((1L, "a", 10.0)),
      Seq((1L, "u", 50.0, 1), (1L, "d", 0.0, 2)))
    assert(del == Map.empty)
  }

  test("upsert of an absent key inserts; delete of an absent key is a no-op") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "bal")
    val log = Seq((2L, "u", 5.0, 1), (3L, "d", 0.0, 1)).toDF("k", "op", "bal", "seq")
    val got = Cdc.apply(base, log, "k", "op", Seq("seq"), Seq("bal"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(got == Set((1L, Some("a"), 10.0), (2L, None, 5.0)))
  }

  test("upsert carrying NULL in a payload column overwrites with NULL") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    val log = Seq((1L, "u", Option.empty[Double], 1))
      .toDF("k", "op", "bal", "seq")
    val got = Cdc.apply(base, log, "k", "op", Seq("seq"), Seq("bal"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // the op-gated merge must NOT resurrect the old 10.0 via coalesce
    assert(got == Map(1L -> None, 2L -> Some(20.0)))
  }

  test("non-payload base columns pass through unchanged on upsert") {
    val got = run(Seq((1L, "keepme", 10.0)), Seq((1L, "u", 11.0, 1)))
    assert(got(1L) == ("keepme", 11.0))
  }

  test("applying the same log twice is idempotent") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val log = Seq((1L, "u", 99.0, 1), (2L, "d", 0.0, 1)).toDF("k", "op", "bal", "seq")
    val once = Cdc.apply(base, log, "k", "op", Seq("seq"), Seq("bal"))
    val twice = Cdc.apply(once, log, "k", "op", Seq("seq"), Seq("bal"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("foldVersioned: any batch order converges; tombstones block stragglers") {
    import spark.implicits._
    def log(rows: (Long, String, Double, Int)*) =
      rows.toDF("k", "op", "bal", "seq")
    // key 1: upsert@1, upsert@5; key 2: upsert@2, delete@4, straggler upsert@3
    // key 3: only a delete (never existed)
    val batches = Seq(
      log((1L, "u", 10.0, 1), (2L, "u", 20.0, 2)),
      log((1L, "u", 50.0, 5), (2L, "d", 0.0, 4), (3L, "d", 0.0, 1)),
      log((2L, "u", 99.0, 3))) // straggler: OLDER than the delete
    val empty = log().limit(0)
    def fold(order: Seq[Int]) =
      order.foldLeft(empty)((st, i) => Cdc.foldVersioned(st, batches(i),
        "k", "op", Seq("seq"), Seq("bal")))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    val a = fold(Seq(0, 1, 2))
    val b = fold(Seq(2, 1, 0))
    val c = fold(Seq(1, 0, 2))
    val whole = Cdc.foldVersioned(empty, batches.reduce(_ unionByName _),
      "k", "op", Seq("seq"), Seq("bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == whole && b == whole && c == whole,
      s"fold must be batch-order independent: $a vs $b vs $c vs $whole")
    // key 2's delete@4 beats the straggler upsert@3 — no resurrection
    assert(whole == Set((1L, "u", 50.0, 5), (2L, "d", 0.0, 4), (3L, "d", 0.0, 1)))
    // readers see only live rows
    val liveRows = Cdc.live(Cdc.foldVersioned(empty,
      batches.reduce(_ unionByName _), "k", "op", Seq("seq"), Seq("bal")), "op")
      .collect().map(_.getLong(0)).toSet
    assert(liveRows == Set(1L))
  }

  test("plan: log collapses via aggregate, not a per-key window") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "bal")
    val log = Seq((1L, "u", 99.0, 1)).toDF("k", "op", "bal", "seq")
    val plan = Cdc.apply(base, log, "k", "op", Seq("seq"), Seq("bal"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "latest-change pick must be a partial-aggregable max_by")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }
}
