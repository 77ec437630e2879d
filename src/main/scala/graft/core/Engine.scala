package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level conveniences: build a properly-configured session and
  * expose the fixture tables to `spark.sql(...)`. */
object Engine {

  /** Recommended session settings (mirrors Bench/Verify): AQE on, small
    * shuffle fan-out for local mode, UTC for oracle parity. */
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Register every fixture table as a temp view so the full engine
    * surface is reachable through plain SQL. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      Tables.t(spark, dir, name).createOrReplaceTempView(name)
    }
}
