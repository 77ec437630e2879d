package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level conveniences: build a properly-configured session and
  * expose the fixture tables to `spark.sql(...)`. */
object Engine {

  /** Recommended session settings (mirrors Bench/Verify): AQE on, small
    * shuffle fan-out for local mode, UTC for oracle parity. */
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    installOptimizations(spark)
    spark
  }

  /** Install the engine's optimizer rules (idempotent) — currently the
    * raw-ns range-pushdown rewrite (graft.plans.NsEpochRangeRule). */
  def installOptimizations(spark: SparkSession): Unit = {
    val cur = spark.sessionState.experimentalMethods.extraOptimizations
    if (!cur.contains(graft.plans.NsEpochRangeRule))
      spark.sessionState.experimentalMethods.extraOptimizations =
        cur :+ graft.plans.NsEpochRangeRule
  }

  /** Register every fixture table as a temp view so the full engine
    * surface is reachable through plain SQL. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      Tables.t(spark, dir, name).createOrReplaceTempView(name)
    }
}
