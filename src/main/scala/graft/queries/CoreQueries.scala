package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}

/** Scans, filters, projection, sort, limit — the reference's only live
  * query (inclusive time-range scan, ChronoBase tablet.go:366-387) plus the
  * standard single-table surface its dead `Query{Limit,Ascending}` API
  * intended (types.go:16-21). SURVEY.md §2c Q1–Q8.
  *
  * Scale notes: every query here is a single parquet scan whose predicate
  * and projection push down to the reader (verified via explain —
  * PushedFilters / ReadSchema); with the production layout partitioned by
  * time bucket, the ts-range predicates also prune partitions, which is the
  * reference's manual tablet min/max skip (table.go:146-150) for free.
  */
object CoreQueries {
  import Tables.t

  private val lo = "2024-01-05 00:00:00"
  private val hi = "2024-01-15 00:00:00"

  /** Q1: inclusive [start,end] time-range scan — reference parity
    * (ts BETWEEN is inclusive on both ends, matching tablet.go:366-367).
    * Canonical (ts, event_id) output order for stable hashing.
    */
  def timeRange(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsRange(spark, dir,
        java.sql.Timestamp.valueOf(lo), java.sql.Timestamp.valueOf(hi))
      .orderBy(col("ts"), col("event_id"))

  /** Q3: key + time point lookup — the intent of the reference's dead
    * findBlockForKey (index.go:231-236). */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsRange(spark, dir,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-31 00:00:00"))
      .filter(col("user_id") === 3)
      .orderBy(col("ts"), col("event_id"))

  /** Q4: projection (column pruning reaches the scan). */
  def projection(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture — order
      // by every output column for a deterministic total order.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** Q5: compound predicates — AND/OR/NOT/IN/BETWEEN/LIKE. */
  def predicates(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(
        col("l_returnflag").isin("A", "R") &&
          !(col("l_linestatus") === "O") &&
          col("l_quantity").between(10, 20) &&
          (col("l_discount") < 0.03 || col("l_tax") > 0.05))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_discount"), col("l_tax"))

  /** Q6: order-by (dead `Ascending` intent, types.go:19). */
  def sortQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .orderBy(col("value").desc, col("event_id"))

  /** Q7: limit / top-n (dead `Limit` intent). orderBy+limit plans as a
    * TakeOrderedAndProject — no global sort at scale. */
  def limitQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .orderBy(col("ts"), col("event_id"))
      .limit(100)

  /** Q8: top-k per group via ranking window. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_time_range", timeRange, Some(
      s"""SELECT * FROM events
         |WHERE ts BETWEEN TIMESTAMP '$lo' AND TIMESTAMP '$hi'
         |ORDER BY ts, event_id""".stripMargin), headline = true),
    QueryDef("q02_point_lookup", pointLookup, Some(
      """SELECT * FROM events
        |WHERE user_id = 3
        |  AND ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-31 00:00:00'
        |ORDER BY ts, event_id""".stripMargin)),
    QueryDef("q03_projection", projection, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin)),
    QueryDef("q04_predicates", predicates, Some(
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount, l_tax
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND NOT (l_linestatus = 'O')
        |  AND l_quantity BETWEEN 10 AND 20
        |  AND (l_discount < 0.03 OR l_tax > 0.05)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount, l_tax""".stripMargin)),
    QueryDef("q05_sort", sortQ, Some(
      """SELECT event_id, ts, user_id, value FROM events
        |ORDER BY value DESC, event_id""".stripMargin)),
    QueryDef("q06_limit", limitQ, Some(
      "SELECT * FROM events ORDER BY ts, event_id LIMIT 100")),
    QueryDef("q07_topk_per_group", topkPerGroup, Some(
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin), headline = true)
  )
}
