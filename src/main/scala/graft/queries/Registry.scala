package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** All query suites, keyed by query name. Each entry: (query fn,
  * optional DuckDB oracle SQL). */
object Registry {
  def suites: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    RelationalQueries.all ++
      RasterQueries.all ++
      TextQueries.all ++
      SimQueries.all ++
      MiscQueries.all ++
      ChangeQueries.all ++
      AdvancedQueries.all
}
