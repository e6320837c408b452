package graft

import org.apache.spark.sql.functions._

/** The derived partsupp fixture's contract (Tables.partsuppFrom):
  * the four inventory TPC-H shapes lean on (ps_partkey, ps_suppkey)
  * being a true primary key with exactly 4 distinct suppliers per
  * part, valid 0-based key ranges, and dbgen-band values — and on the
  * derivation being a pure function of (part, |supplier|) so the
  * DuckDB CTE twin stays bit-identical. */
class PartsuppSpec extends SparkSpec {

  test("partsupp: 4 distinct suppliers per part, PK holds, ranges in band") {
    val ps = Tables.partsupp(spark, sf001).cache()
    try {
      val nPart = Tables.part(spark, sf001).count()
      val nSupp = Tables.supplier(spark, sf001).count()
      assert(ps.count() === nPart * 4)
      assert(ps.select(col("ps_partkey"), col("ps_suppkey"))
        .distinct().count() === nPart * 4, "PK (partkey, suppkey) violated")
      val perPart = ps.groupBy(col("ps_partkey"))
        .agg(countDistinct(col("ps_suppkey")).as("k"))
        .agg(min(col("k")).as("lo"), max(col("k")).as("hi")).head()
      assert(perPart.getLong(0) === 4L && perPart.getLong(1) === 4L,
        "every part must have exactly 4 distinct suppliers")
      val b = ps.agg(
        min(col("ps_suppkey")), max(col("ps_suppkey")),
        min(col("ps_availqty")), max(col("ps_availqty")),
        min(col("ps_supplycost_c")), max(col("ps_supplycost_c"))).head()
      assert(b.getLong(0) >= 0L && b.getLong(1) < nSupp,
        "suppkey out of the 0-based supplier key range")
      assert(b.getInt(2) >= 1 && b.getInt(3) <= 9999, "availqty band")
      assert(b.getLong(4) >= 100L && b.getLong(5) <= 100000L,
        "supplycost band ($1..$1000 in cents, the dbgen band)")
    } finally ps.unpersist()
  }

  test("partsupp: every ps_suppkey joins a real supplier (referential integrity)") {
    val orphans = Tables.partsupp(spark, sf001)
      .join(Tables.supplier(spark, sf001),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
    assert(orphans.count() === 0L)
  }
}
