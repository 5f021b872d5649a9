package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-module registries (CdcQueries,
  * AnalyticsQueries, ...) so each operator family owns its own
  * query+oracle pairs; this object just aggregates them.
  */
object SparkEntry {

  private def registries: Seq[QueryRegistry] = Seq(
    CdcQueries,
    operators.AnalyticsQueries,
    operators.DedupQueries,
    operators.TextQueries,
    operators.ModelPrepQueries,
    operators.SimilarityQueries,
    operators.MultimodalQueries,
    operators.PackingQueries,
    operators.LakeQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CdcBatch.compactedSnapshot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracles).toMap
}

/** A module-local set of (query, oracle) pairs. */
trait QueryRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
