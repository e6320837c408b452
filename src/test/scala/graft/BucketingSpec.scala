package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (the 100 TB pattern for repeated fact⋈fact
  * joins): writing both sides bucketed on the join key lets the join
  * run shuffle-free — each bucket pair joins locally. The spec asserts
  * the plan has NO shuffle exchange on the join path and results match
  * the plain join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf001)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val li = spark.table("li_bucketed")
    val o = spark.table("ord_bucketed")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"), first(col("o_totalprice")).as("price"))

    // force a non-broadcast join so the bucketing is what saves the shuffle
    val noBroadcast = joined.hint("merge")
    val plan = noBroadcast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    val expected = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey")).distinct().count()
    assert(noBroadcast.count() == expected)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
