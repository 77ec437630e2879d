package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Physical-layout operators for multi-dimensional locality — the
  * Z-order (Morton) clustering that table formats apply when a 100 TB
  * table is range-queried on MORE than one dimension. A single-column
  * sort gives parquet min/max pruning on that column only; sorting by
  * the interleaved Z-value bounds EVERY participating dimension's span
  * per file, so a 2-D predicate (e.g. user ∧ time window) skips files
  * on both. (The reference's tablet layout is time-ordered only —
  * ChronoBase tablet.go min/max pruning on ts; this is the
  * multi-dimension generalization its users would need at scale.)
  *
  * Everything is exact integer arithmetic on longs — no doubles, no
  * hash — so layouts are deterministic, reproducible, and the Z-value
  * column is cross-engine verifiable (the oracle SQL replicates the
  * same shifts bit for bit).
  */
object Layout {

  /** Scale a value in [min, max] to an integer in [0, 2^bits):
    * floor((v - min) * 2^bits / (max - min + 1)) — pure integer
    * arithmetic (exact while (max-min+1)·2^bits < 2^63; require bits
    * small enough for the domain). Values outside [min, max] are
    * clamped, so a stray outlier degrades locality instead of
    * corrupting the curve.
    */
  def scaleToBits(v: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(max >= min, s"empty domain [$min, $max]")
    val width = max - min + 1
    require(width <= (Long.MaxValue >> bits),
      s"domain width $width * 2^$bits overflows long — lower bits")
    val clamped = greatest(least(v.cast("long"), lit(max)), lit(min))
    // IntegralDivide (SQL `div`): Column./ is DOUBLE division, which
    // silently rounds once the scaled product passes 2^53
    column(IntegralDivide(
      expression((clamped - min) * (1L << bits)), expression(lit(width))))
  }

  /** Morton/Z-value of two `bits`-bit non-negative integers: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Unrolled shift
    * chain (2·bits terms) — plain codegen'd long ops, no UDF.
    */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same Z-value as ANSI SQL text over expressions `a`/`b` —
    * generated from the identical unrolled terms so an external oracle
    * (DuckDB) reproduces the Spark column bit for bit. */
  def zValue2Sql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Z-order a frame by two long columns over known domains: one
    * range-partitioned sort on the interleaved value (the same single
    * global sort any layout rewrite costs — see Curation.shuffleOrder),
    * carrying a `zval` column callers can range-write or bucket by.
    */
  def zOrderBy(
      df: DataFrame,
      colA: String, minA: Long, maxA: Long,
      colB: String, minB: Long, maxB: Long,
      bits: Int = 16): DataFrame =
    df.withColumn("zval",
        zValue2(
          scaleToBits(col(colA), minA, maxA, bits),
          scaleToBits(col(colB), minB, maxB, bits), bits))
      .orderBy(col("zval"))
}
