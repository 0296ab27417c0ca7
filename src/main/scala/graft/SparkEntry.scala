package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module under `graft.queries` contributes
  * `QueryDef`s (Spark plan + optional DuckDB oracle SQL). Column names are
  * aliased identically on both sides — the driver's compare sorts columns
  * by name before hashing.
  */
object SparkEntry {

  /** Every registered query, in module order. */
  def all: Seq[QueryDef] =
    CoreQueries.defs ++ JoinQueries.defs ++ SessionQueries.defs ++ DiagQueries.defs ++
      ForecastQueries.defs ++ TextQueries.defs ++ EmbeddingQueries.defs ++
      MultimodalQueries.defs ++ SketchQueries.defs ++ GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full §3.1 analyze pipeline (SURVEY §7.3): covariate forecast →
    * splice → align → target forecast with regressor. */
  def entry(spark: SparkSession): DataFrame =
    queries("q41_analyze_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
