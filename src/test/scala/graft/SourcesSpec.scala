package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine reads parquet (harness), CSV
  * (GSOD ingest, IngestSpec) — here JSON-lines and ORC round-trips on a
  * harness table, with schema and values preserved.
  */
class SourcesSpec extends SparkSpec {

  private lazy val sample = Tables.lineitem(spark, sf001)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    .limit(100)

  private def roundTrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$format").toString + "/data"
    sample.write.format(format).save(dir)
    val back = spark.read.format(format)
      .schema(sample.schema) // JSON would otherwise widen int -> bigint
      .load(dir)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    assert(back.schema == sample.schema)
    val a = sample.collect().map(_.toString).toSeq
    val b = back.collect().map(_.toString).toSeq
    assert(a == b, s"$format round-trip mismatch")
  }

  test("ORC round-trip preserves schema and values")(roundTrip("orc"))
  test("JSON-lines round-trip preserves schema and values")(roundTrip("json"))

  test("partitioned parquet write + partition pruning in the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/data"
    Tables.lineitem(spark, sf001)
      .write.partitionBy("l_returnflag").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    val expected = Tables.lineitem(spark, sf001)
      .filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected)
  }

  test("mergeSchema reconciles generations: missing column reads as NULL, gen pruning works") {
    val out = graft.queries.IngestQueries.qSchemaEvolution(spark, sf001)
    // gen-1 rows (no priority column in their files) surface NULL;
    // gen-2 rows carry the value
    assert(out.filter(col("gen") === 1 && col("o_orderpriority").isNotNull).count() == 0)
    assert(out.filter(col("gen") === 2 && col("o_orderpriority").isNull).count() == 0)
    val total = Tables.orders(spark, sf001).count()
    assert(out.count() == total)
    // generation-targeted reads still prune at the directory level
    val pruned = out.filter(col("gen") === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }
}
