package graft.core

import graft.SparkSuite

class EngineSpec extends SparkSuite {
  import spark.implicits._

  test("registerTables exposes the surface through spark.sql") {
    Engine.registerTables(spark, sf())
    val n = spark.sql(
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
        |              AND TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    assert(n.count() === 5)
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(joined.as[(String, Long)].collect().map(_._2).sum === 150L)
  }
}
