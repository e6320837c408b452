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

  // ---- harness-table drift-proofing (Tables.canon) -------------------
  // r9 lesson: the driver regenerated /root/testdata and events.ts went
  // from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), silently killing 30
  // queries. These cases pin the post-load canonical schema for every
  // table and prove the loader adapts across temporal encodings.

  test("every harness table loads with its canonical post-load schema") {
    import org.apache.spark.sql.types._
    val loaders: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> Tables.region(spark, sf001),
      "nation" -> Tables.nation(spark, sf001),
      "customer" -> Tables.customer(spark, sf001),
      "supplier" -> Tables.supplier(spark, sf001),
      "part" -> Tables.part(spark, sf001),
      "orders" -> Tables.orders(spark, sf001),
      "lineitem" -> Tables.lineitem(spark, sf001),
      "events" -> Tables.events(spark, sf001),
      "documents" -> Tables.documents(spark, sf001),
      "embeddings" -> Tables.embeddings(spark, sf001))
    val cols = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"),
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    loaders.foreach { case (name, df) =>
      assert(df.columns.toSet == cols(name), s"$name column drift")
    }
    // temporal canon: events.ts is session-local (hash-green through r8);
    // shipdate/orderdate stay NTZ (hash-green in r9 for raw projections)
    assert(loaders.toMap.apply("events").schema("ts").dataType == TimestampType)
    assert(loaders.toMap.apply("lineitem").schema("l_shipdate").dataType == TimestampNTZType)
    assert(loaders.toMap.apply("orders").schema("o_orderdate").dataType == TimestampNTZType)
  }

  test("events loader adapts a nanos-as-long encoding to the same instants") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-drift").toString
    val canonical = Tables.events(spark, sf001).limit(500).cache()
    // re-encode ts as an epoch-nanos INT64 column (how a TIMESTAMP(NANOS)
    // file surfaces under spark.sql.legacy.parquet.nanosAsLong)
    canonical
      .withColumn("ts", (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
      .write.parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir)
    assert(back.schema("ts").dataType == TimestampType)
    val a = canonical.select("event_id", "ts").orderBy("event_id").collect().toSeq
    val b = back.select("event_id", "ts").orderBy("event_id").collect().toSeq
    assert(a == b, "nanos-long adaptation changed instants")
  }

  test("events loader adapts a TIMESTAMP_NTZ encoding to the same instants") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-drift-ntz").toString
    val canonical = Tables.events(spark, sf001).limit(500).cache()
    canonical
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir)
    assert(back.schema("ts").dataType == TimestampType)
    val a = canonical.select("event_id", "ts").orderBy("event_id").collect().toSeq
    val b = back.select("event_id", "ts").orderBy("event_id").collect().toSeq
    assert(a == b, "NTZ adaptation changed instants")
  }

  test("column drift (rename/addition) fails with a named error, not an opaque analysis exception") {
    val dir = Files.createTempDirectory("graft-drift-cols").toString
    Tables.events(spark, sf001).limit(10).withColumnRenamed("props", "payload")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events") && e.getMessage.contains("payload"), e.getMessage)
  }

  test("additive-only drift survives: benign new columns are dropped, queries keep running") {
    // a regenerated harness growing an extra column must NOT brick the
    // engine — every query projects explicit columns, so canon drops it
    val dir = Files.createTempDirectory("graft-drift-add").toString
    Tables.events(spark, sf001).limit(10).withColumn("ingest_batch", lit(7))
      .write.parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir)
    assert(back.columns.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(back.count() == 10)
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
