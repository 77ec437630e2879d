package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, QueryDef, Tables}

/** Source-format coverage (SURVEY.md §2c Q2): the reference reads only
  * its own `.tab` block format (tablet.go:203-281); the Spark engine
  * reads parquet natively plus CSV and JSON through the same DataFrame
  * surface. The declared query round-trips a table through both text
  * formats and reads them back — the oracle checks the result equals the
  * parquet content, proving reader fidelity. */
object SourceQueries {
  import Tables.t

  /** Q2: parquet → CSV + JSON + ORC → read each back → three-way join.
    * The oracle checks the joined result equals the parquet content,
    * proving reader/writer fidelity for every format. */
  def multiFormat(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val tmp = Files.createTempDirectory("q02_formats").toString
    nation.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$tmp/nation_csv")
    nation.coalesce(1).write.mode("overwrite").json(s"$tmp/nation_json")
    nation.coalesce(1).write.mode("overwrite").orc(s"$tmp/nation_orc")

    val fromCsv = spark.read
      .option("header", "true")
      .schema(nation.schema)
      .csv(s"$tmp/nation_csv")
      .select(col("n_nationkey"), col("n_name"))
    val fromJson = spark.read
      .schema(nation.schema)
      .json(s"$tmp/nation_json")
      .select(col("n_nationkey").as("j_key"))
    val fromOrc = spark.read
      .orc(s"$tmp/nation_orc")
      .select(col("n_nationkey").as("o_key"), col("n_regionkey"))

    fromCsv
      .join(fromJson, fromCsv("n_nationkey") === fromJson("j_key"))
      .join(fromOrc, fromCsv("n_nationkey") === fromOrc("o_key"))
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  /** S2 (batch-checkable form): epoch-aligned 6-hour tumbling window
    * aggregate — the exact bucketing `window($"ts","6 hours")` performs
    * in the streaming path, verified against DuckDB arithmetic. */
  def windowBucket(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("n"), col("sum_value"))
      .orderBy(col("win_start"))

  /** Q20c: explicit GROUPING SETS (beyond rollup/cube). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |       o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q02b_multiformat", multiFormat, Some(
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin)),
    QueryDef("s2_window_bucket", windowBucket, Some(
      s"""SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS win_start,
         |       make_timestamp((epoch_us(ts) // 21600000000) * 21600000000 + 21600000000) AS win_end,
         |       COUNT(*) AS n, ${Det.dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY win_start""".stripMargin)),
    QueryDef("q23b_grouping_sets", groupingSets, Some(
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |       o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin))
  )
}
