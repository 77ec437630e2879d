package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.QueryDef
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared engine surface: every operator from SURVEY.md §2c is one
  * [[QueryDef]] in a category module; this object aggregates them into
  * the `queries` / `oracleSql` maps the driver hash-checks against DuckDB.
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    CoreQueries.defs ++ TimeSeriesQueries.defs ++ JoinQueries.defs ++
      SubqueryQueries.defs ++ AggQueries.defs ++ WindowQueries.defs ++
      SetOpQueries.defs ++ ScalarFnQueries.defs ++ NorthStarQueries.defs ++
      StreamingQueries.defs ++ SourceQueries.defs ++ SqlQueries.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one live query: inclusive time-range scan
    * (ChronoBase db.go:155-162 → tablet.go:366-387). */
  def entry(spark: SparkSession): DataFrame =
    graft.core.Tables.eventsRange(spark, "/root/testdata/sf0.001",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-31 00:00:00"))
      .orderBy(col("ts"), col("event_id"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
