package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: two-phase salted groupBy for keys whose
  * row counts would overwhelm a single reducer at 100 TB (AQE splits
  * skewed JOIN partitions, but a straight groupBy on a hot key still
  * funnels through one task — salting fixes that).
  *
  * Phase 1 groups on (keys, salt) — spreading a hot key over `saltBuckets`
  * reducers; phase 2 merges the partials. Only algebraic aggregates are
  * offered (sum/count/min/max), since they re-combine losslessly.
  */
object Skew {

  final case class SaltedAgg(col: Column, name: String, combine: String)

  def sum_(c: Column, name: String): SaltedAgg = SaltedAgg(sum(c), name, "sum")
  def count_(name: String): SaltedAgg = SaltedAgg(count(lit(1)), name, "sum")
  def min_(c: Column, name: String): SaltedAgg = SaltedAgg(min(c), name, "min")
  def max_(c: Column, name: String): SaltedAgg = SaltedAgg(max(c), name, "max")

  def saltedGroupBy(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[SaltedAgg],
      saltBuckets: Int = 32): DataFrame = {

    // Deterministic salt: hash the row (keys + payload), so a task
    // retry re-assigns every row to the same bucket —
    // spark_partition_id/monotonically_increasing_id would not survive a
    // retry. Fully identical duplicate rows share a bucket; that only
    // hurts spreading if a hot key's rows are byte-identical, and the
    // algebraic partials stay correct under any assignment either way.
    // MapType columns are excluded from the hash (Spark's hash() rejects
    // maps — their entry order is undefined); if every column is a map
    // the salt degrades to a single bucket rather than failing, which
    // is still correct, just unspread.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = df.schema.fields.collect {
      case f if !hasMap(f.dataType) => col(f.name)
    }.toSeq
    val salted = df.withColumn("__salt",
      if (hashable.isEmpty) lit(0)
      else pmod(hash(hashable: _*), lit(saltBuckets)))

    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.col.as(aggs.head.name),
        aggs.tail.map(a => a.col.as(a.name)): _*)

    val combined = aggs.map { a =>
      (a.combine match {
        case "sum" => sum(col(a.name))
        case "min" => min(col(a.name))
        case "max" => max(col(a.name))
      }).as(a.name)
    }
    phase1.groupBy(keys.map(col): _*)
      .agg(combined.head, combined.tail: _*)
  }
}
