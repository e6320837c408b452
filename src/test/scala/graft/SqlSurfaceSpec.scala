package graft

import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, JoinQueries}

/** SQL front-end parity (SURVEY.md §7.6: `spark.sql` comes free):
  * registering the harness tables as temp views and running ANSI SQL
  * through Spark's own parser must agree with the DataFrame-API
  * queries. (The DuckDB oracle checks cross-engine; this checks
  * cross-frontend within the engine.)
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
      Tables.load(spark, sf001, t).createOrReplaceTempView(t)
    }

  test("spark.sql q1 pricing summary == DataFrame q1_agg") {
    registerViews()
    val sql = spark.sql(CoreQueries.q1AggSql).collect()
    val df = CoreQueries.q1Agg(spark, sf001).collect()
    assert(sql.length == df.length)
    sql.zip(df).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getString(1) == b.getString(1))
      (2 to 6).foreach(i => assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-6))
      assert(a.getLong(7) == b.getLong(7))
    }
  }

  test("spark.sql sessionize (windowed gap cumsum) == DataFrame window composition") {
    Tables.events(spark, sf001).createOrReplaceTempView("events")
    val sql = spark.sql(CoreQueries.qSessionizeSql).collect()
    val df = CoreQueries.qSessionize(spark, sf001).collect()
    assert(sql.length == df.length && sql.nonEmpty)
    sql.zip(df).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
      assert(a.getLong(2) == b.getLong(2))
      assert(a.getTimestamp(3) == b.getTimestamp(3) && a.getTimestamp(4) == b.getTimestamp(4))
      assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-6)
    }
  }

  test("spark.sql star join == DataFrame revenue-by-nation") {
    registerViews()
    val sql = spark.sql(JoinQueries.qJoinRevenueByNationSql).collect()
    val df = JoinQueries.qJoinRevenueByNation(spark, sf001).collect()
    assert(sql.length == df.length)
    sql.zip(df).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getString(1) == b.getString(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }
}
