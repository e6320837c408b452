package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCD2 merge invariants: row-class behavior (kept / closed / opened /
  * inserted), exactly-one-current per live key, idempotence of
  * re-applying a batch, and history immutability across successive
  * merges — the reproducibility contract the operator exists for. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def snap(rows: Seq[(Long, String, Double, String, Option[String], Boolean)]): DataFrame =
    rows.toDF("key", "segment", "acctbal", "ef", "et", "is_current")
      .select(col("key"), col("segment"), col("acctbal"),
        to_date(col("ef")).as("effective_from"),
        to_date(col("et")).as("effective_to"), col("is_current"))

  private val base = snap(Seq(
    (1L, "AUTO", 10.0, "2020-01-01", None, true),
    (2L, "AUTO", 20.0, "2020-01-01", None, true),
    (3L, "BIKE", 30.0, "2020-01-01", None, true)))

  private def batch(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("key", "segment", "acctbal")

  private val d1 = to_date(lit("2024-06-01"))

  test("changed key closes + reopens; no-op key stays; new key inserts") {
    val out = Scd2.merge(base,
      batch((1L, "AUTO", 11.0), (2L, "AUTO", 20.0), (9L, "NEW", 0.0)),
      "key", Seq("segment", "acctbal"), d1)
      .orderBy(col("key"), col("effective_from")).collect()
    val byKey = out.groupBy(_.getLong(0))
    // key 1 changed: exactly two rows, old closed at d1, new open
    val k1 = byKey(1L).sortBy(r => r.getDate(3).toString)
    assert(k1.length == 2)
    assert(!k1(0).getBoolean(5) && k1(0).getDate(4).toString == "2024-06-01"
      && k1(0).getDouble(2) == 10.0)
    assert(k1(1).getBoolean(5) && k1(1).isNullAt(4)
      && k1(1).getDouble(2) == 11.0
      && k1(1).getDate(3).toString == "2024-06-01")
    // key 2 no-op: single open row, untouched
    assert(byKey(2L).length == 1 && byKey(2L).head.getBoolean(5)
      && byKey(2L).head.getDate(3).toString == "2020-01-01")
    // key 3 untouched: carried unchanged
    assert(byKey(3L).length == 1 && byKey(3L).head.getBoolean(5))
    // key 9 inserted: one open row from d1
    assert(byKey(9L).length == 1 && byKey(9L).head.getBoolean(5)
      && byKey(9L).head.getDate(3).toString == "2024-06-01")
  }

  test("exactly one current row per live key after any merge") {
    val out = Scd2.merge(base,
      batch((1L, "AUTO", 11.0), (3L, "CAR", 30.0), (9L, "NEW", 0.0)),
      "key", Seq("segment", "acctbal"), d1)
    val perKey = out.filter(col("is_current"))
      .groupBy(col("key")).count().collect()
    assert(perKey.forall(_.getLong(1) == 1L))
    assert(perKey.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 9L))
  }

  test("re-applying the same batch is a no-op (idempotence)") {
    val b = batch((1L, "AUTO", 11.0), (9L, "NEW", 0.0))
    val once = Scd2.merge(base, b, "key", Seq("segment", "acctbal"), d1)
    val twice = Scd2.merge(once, b, "key", Seq("segment", "acctbal"),
      to_date(lit("2024-07-01")))
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("history rows survive later merges verbatim") {
    val after1 = Scd2.merge(base, batch((1L, "AUTO", 11.0)),
      "key", Seq("segment", "acctbal"), d1)
    val closed1 = after1.filter(!col("is_current")).collect().toSet
    val after2 = Scd2.merge(after1, batch((1L, "AUTO", 12.0)),
      "key", Seq("segment", "acctbal"), to_date(lit("2025-01-01")))
    val history2 = after2.filter(!col("is_current")).collect().toSet
    // first-generation closed rows are a verbatim subset of history
    assert(closed1.subsetOf(history2))
    // and the second close added exactly one more history row
    assert(history2.size == closed1.size + 1)
    // three versions of key 1 now exist, date ranges chaining
    val k1 = after2.filter(col("key") === 1L)
      .orderBy(col("effective_from")).collect()
    assert(k1.length == 3)
    assert(k1(0).getDate(4).toString == "2024-06-01")
    assert(k1(1).getDate(3).toString == "2024-06-01"
      && k1(1).getDate(4).toString == "2025-01-01")
    assert(k1(2).getDate(3).toString == "2025-01-01" && k1(2).isNullAt(4))
  }

  test("null payloads compare null-safely (no phantom versioning)") {
    val s0 = Seq((1L, Option.empty[String], 10.0, "2020-01-01", Option.empty[String], true))
      .toDF("key", "segment", "acctbal", "ef", "et", "is_current")
      .select(col("key"), col("segment"), col("acctbal"),
        to_date(col("ef")).as("effective_from"),
        to_date(col("et")).as("effective_to"), col("is_current"))
    val b = Seq((1L, Option.empty[String], 10.0)).toDF("key", "segment", "acctbal")
    val out = Scd2.merge(s0, b, "key", Seq("segment", "acctbal"), d1)
    assert(out.count() == 1 && out.head().getBoolean(5),
      "identical NULL payload must not version")
  }
}
