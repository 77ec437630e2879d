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

  /** Skew-resilient equi-join: salt the big (skewed) side, replicate the
    * small side once per salt bucket, join on (key, salt). A hot key's
    * rows land on `saltBuckets` reducers instead of one.
    *
    * When to reach for this instead of the built-ins, in order: (1) if
    * the small side fits in memory, `broadcast()` — no shuffle at all;
    * (2) if it doesn't and the join is sort-merge, AQE's skew-join
    * splits oversized partitions at runtime. Salting is the remaining
    * case: a non-broadcastable small side combined with downstream ops
    * that defeat AQE's splitting (a bucketed/co-partitioned pipeline
    * that must preserve partitioning, or an engine without AQE), or a
    * key so hot it exceeds a single task's memory even within one
    * partition split. The small side is replicated `saltBuckets`× —
    * size the bucket count to the skew, not higher: replication cost
    * is saltBuckets × |small|.
    *
    * Salt derivation matches [[saltedGroupBy]]: a deterministic hash of
    * the big side's non-map columns, so task retries re-derive the same
    * assignment (no RNG, no partition id). Inner join only — salting an
    * outer join would emit the small side's unmatched rows once per
    * salt bucket.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 32): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = big.schema.fields.collect {
      case f if !hasMap(f.dataType) => col(f.name)
    }.toSeq
    val saltedBig = big.withColumn("__salt",
      if (hashable.isEmpty) lit(0)
      else pmod(hash(hashable: _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
