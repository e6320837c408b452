package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, DedupQueries, ExtraQueries, ImputeQueries, IngestQueries, JoinQueries, MlQueries, MultimodalQueries, PartsuppQueries, QualityQueries, ReleaseQueries, SimilarityQueries, TextQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each key in [[queries]] is one implemented operator from SURVEY.md §2;
  * [[oracleSql]] carries the DuckDB ANSI-SQL twin (omitted for
  * non-SQL-expressible ops, where the driver falls back to a rows-only
  * check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ JoinQueries.queries ++ WindowQueries.queries ++
      ImputeQueries.queries ++ MlQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++ MultimodalQueries.queries ++
      ExtraQueries.queries ++ IngestQueries.queries ++ AnalyticsQueries.queries ++ QualityQueries.queries ++ PartsuppQueries.queries ++ ReleaseQueries.queries

  /** DuckDB twins, keyed identically to [[queries]]. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ JoinQueries.oracles ++ WindowQueries.oracles ++
      ImputeQueries.oracles ++ MlQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextQueries.oracles ++ MultimodalQueries.oracles ++
      ExtraQueries.oracles ++ IngestQueries.oracles ++ AnalyticsQueries.oracles ++ QualityQueries.oracles ++ PartsuppQueries.oracles ++ ReleaseQueries.oracles
}
