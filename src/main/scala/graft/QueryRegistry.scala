package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine capability exposed to the driver's correctness gate.
  *
  * `run` builds the lazy DataFrame for one operator from SURVEY.md §2;
  * `oracle` is the equivalent ANSI SQL the driver executes in DuckDB over the
  * same parquet tables. Column names/aliases MUST match between the two
  * (the compare sorts columns by name before hashing).
  *
  * Determinism rules used throughout the registry:
  *   - every query ends in a total ORDER BY on its output key;
  *   - money/measure aggregations are computed in DECIMAL (exact, associative,
  *     partition-order-independent) and only cast to double at the end, so
  *     Spark-on-32-threads and DuckDB produce bit-identical doubles;
  *   - float-producing formulas are written as the same expression tree on
  *     both sides so IEEE evaluation matches.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object QueryRegistry {
  def all: Seq[QuerySpec] =
    queries.CoreRelational.specs ++
      queries.StatsQueries.specs ++
      queries.TextQueries.specs ++
      queries.DedupQueries.specs ++
      queries.SimilarityQueries.specs ++
      queries.EventQueries.specs ++
      queries.AnalyticsQueries.specs ++
      queries.PipelineQueries.specs ++
      queries.SketchQueries.specs ++
      queries.GraphQueries.specs ++
      queries.BpeQueries.specs ++
      queries.LinkageQueries.specs ++
      queries.GeoQueries.specs ++
      queries.RankStatsQueries.specs ++
      queries.RetrievalQueries.specs ++
      queries.GovernanceQueries.specs ++
      queries.TimeSeriesQueries.specs ++
      queries.RecommenderQueries.specs ++
      queries.GlmQueries.specs ++
      queries.EvalQueries.specs ++
      queries.FrontierQueries.specs ++
      queries.InferenceQueries.specs

  lazy val byName: Map[String, QuerySpec] = all.map(q => q.name -> q).toMap
}
