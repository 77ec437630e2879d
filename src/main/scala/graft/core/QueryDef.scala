package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: a Spark builder plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. `headline = true` marks queries timed by [[graft.Bench]].
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Cross-engine determinism helpers.
  *
  * Floating-point aggregation order differs between Spark (partial/final
  * over partitions) and DuckDB (sequential), so a plain SUM(double) is not
  * bit-stable. Casting to DECIMAL(25,10) first makes the sum exact and
  * order-independent; casting the exact decimal back to double is then
  * deterministic on both engines. (A double can never be a rounding
  * tie-case at 10 fractional digits — that would require a non-dyadic
  * rational — so HALF_UP vs HALF_EVEN cannot disagree.)
  */
object Det {
  /** Decimal → double via string: decimal→double casts double-round
    * differently across engines (1-ulp divergence observed), while
    * decimal→string is exact and string→double is correctly rounded in
    * both (Java parseDouble / DuckDB fast_float). */
  def dec2dbl(c: Column): Column = c.cast("string").cast("double")

  /** Order-independent, cross-engine-exact sum of a double column. */
  def dsum(c: Column): Column =
    dec2dbl(sum(c.cast(DecimalType(25, 10))))

  /** Deterministic average built from the exact sum. */
  def davg(c: Column): Column =
    dsum(c) / count(lit(1)).cast("double")

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)"

  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / CAST(COUNT(*) AS DOUBLE)"
}
