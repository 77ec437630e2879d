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

  /** Morton/Z-value of n `bits`-bit non-negative integers: bit i of
    * dimension d lands at position i·n + d (dimension 0 owns the least
    * significant lane — [[zValue2]]'s (a, b) layout is the n=2 case).
    * Unrolled shift chain (n·bits terms) — plain codegen'd long ops,
    * no UDF. Table formats cluster on 3–4 columns; n is bounded only
    * by n·bits ≤ 63.
    *
    * PRECONDITION: every input must already lie in [0, 2^bits) — bits
    * at or above position `bits` are silently DROPPED, so an unscaled
    * input yields a colliding, non-monotone curve. [[scaleToBits]] (as
    * applied by [[zOrderBy]]/[[zOrderByN]]) guarantees the range via
    * clamping; if you feed this directly, range-check your inputs.
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n dims x $bits bits exceeds a 63-bit key (n*bits must be <= 63)")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      dims.zipWithIndex.foldLeft(acc) { case (z, (c, d)) =>
        z.bitwiseOR(
          shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + d))
      }
    }
  }

  /** 2-D Morton value — see [[zValueN]] (and its [0, 2^bits)
    * precondition): bit i of `a` lands at position 2i, of `b` at 2i+1. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    zValueN(Seq(a, b), bits)
  }

  /** The same n-D Z-value as ANSI SQL text over expression strings —
    * generated from the identical unrolled terms so an external oracle
    * (DuckDB) reproduces the Spark column bit for bit. */
  def zValueNSql(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n dims x $bits bits exceeds a 63-bit key (n*bits must be <= 63)")
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (e, d) =>
        s"((($e >> $i) & 1) << ${i * n + d})"
      }
    }.mkString(" | ")
  }

  /** 2-D SQL form — see [[zValueNSql]]. */
  def zValue2Sql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    zValueNSql(Seq(a, b), bits)
  }

  /** Z-order a frame by n long columns over known domains — each dim a
    * (column, min, max) triple: one range-partitioned sort on the
    * interleaved value (the same single global sort any layout rewrite
    * costs — see Curation.shuffleOrder), carrying a `zval` column
    * callers can range-write or bucket by.
    */
  def zOrderByN(
      df: DataFrame,
      dims: Seq[(String, Long, Long)],
      bits: Int = 16): DataFrame =
    df.withColumn("zval",
        zValueN(dims.map { case (c, mn, mx) =>
          scaleToBits(col(c), mn, mx, bits)
        }, bits))
      .orderBy(col("zval"))

  /** 2-D convenience form of [[zOrderByN]]. */
  def zOrderBy(
      df: DataFrame,
      colA: String, minA: Long, maxA: Long,
      colB: String, minB: Long, maxB: Long,
      bits: Int = 16): DataFrame =
    zOrderByN(df, Seq((colA, minA, maxA), (colB, minB, maxB)), bits)
}
