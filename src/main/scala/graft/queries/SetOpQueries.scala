package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}

/** Set operations and key-dedup (SURVEY.md §2c Q27–Q29). The reference
  * implicitly UNION ALLs memtable + tablets (table.go:140-156) and its
  * dead `PrimaryKeys` option (types.go:12) implies latest-wins dedup —
  * implemented here properly. */
object SetOpQueries {
  import Tables.t

  private def users(spark: SparkSession, dir: String, typ: String): DataFrame =
    t(spark, dir, "events").filter(col("event_type") === typ)
      .select(col("user_id"))

  /** Q27: UNION (distinct) of two projections. */
  def unionQ(spark: SparkSession, dir: String): DataFrame =
    users(spark, dir, "click").union(users(spark, dir, "purchase"))
      .distinct().orderBy(col("user_id"))

  /** Q28a: INTERSECT. */
  def intersectQ(spark: SparkSession, dir: String): DataFrame =
    users(spark, dir, "click").intersect(users(spark, dir, "error"))
      .orderBy(col("user_id"))

  /** Q28b: EXCEPT — on (user, day) pairs; plain user_id EXCEPT is empty
    * at every SF (all users have all event types). */
  def exceptQ(spark: SparkSession, dir: String): DataFrame = {
    def userDays(typ: String) =
      t(spark, dir, "events").filter(col("event_type") === typ)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
    userDays("view").except(userDays("purchase"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Q28c/Q28d: the ALL (multiset) variants — a different physical
    * shape from the distinct forms (Spark plans INTERSECT/EXCEPT ALL as
    * count-tagged aggregates + generate, not left-semi/anti), and the
    * form dedup pipelines actually need when multiplicity matters
    * ("how many duplicate copies survive in both snapshots"). Count
    * per-user click rows vs view rows. */
  def intersectAllQ(spark: SparkSession, dir: String): DataFrame =
    users(spark, dir, "click").intersectAll(users(spark, dir, "view"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  def exceptAllQ(spark: SparkSession, dir: String): DataFrame =
    users(spark, dir, "click").exceptAll(users(spark, dir, "view"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  /** Q29: latest-wins dedup by key — deterministic (window + full
    * tiebreak), unlike dropDuplicates. This is the honest implementation
    * of the reference's ignored PrimaryKeys option. */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q31_union", unionQ, Some(
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin)),
    QueryDef("q32_intersect", intersectQ, Some(
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin)),
    QueryDef("q33_except", exceptQ, Some(
      """SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin)),
    QueryDef("q32b_intersect_all", intersectAllQ, Some(
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'view')
        |GROUP BY user_id ORDER BY user_id""".stripMargin)),
    QueryDef("q33b_except_all", exceptAllQ, Some(
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'view')
        |GROUP BY user_id ORDER BY user_id""".stripMargin)),
    QueryDef("q34_dedup_latest", dedupLatest, Some(
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin))
  )
}
