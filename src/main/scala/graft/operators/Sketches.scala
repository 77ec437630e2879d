package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch columns — the warehouse pattern the reference's
  * tablet layout points at but never implements: store a small sketch
  * per time bucket, answer cross-bucket questions by MERGING sketches
  * instead of rescanning rows. At 100 TB this turns "distinct users per
  * arbitrary date range" from a full scan into an aggregation over
  * kilobyte-sized state (one sketch per bucket), and sketch merge is
  * associative so Spark's partial aggregation applies to the merge
  * itself.
  *
  * Built on Spark's Apache DataSketches HLL functions (hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate). Merge is lossless: the union
  * of per-bucket sketches has the same registers — hence the same
  * estimate — as one sketch built over all rows (pinned by SketchesSpec).
  */
object Sketches {

  /** One HLL sketch per group (e.g. per time bucket) over `valueCol`. */
  def hllPerGroup(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12, sketchName: String = "sketch"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as(sketchName))

  /** Merge sketches down to a coarser key set (e.g. bucket → day) and
    * estimate. The rows never get rescanned — only sketches move. */
  def hllMergeEstimate(
      sketches: DataFrame, keys: Seq[String],
      sketchCol: String = "sketch", outName: String = "approx_distinct"): DataFrame = {
    val merged = hll_union_agg(col(sketchCol), lit(false))
    val base =
      if (keys.isEmpty) sketches.agg(merged.as(sketchCol))
      else sketches.groupBy(keys.map(col): _*).agg(merged.as(sketchCol))
    base.select((keys.map(col) :+
      hll_sketch_estimate(col(sketchCol)).as(outName)): _*)
  }

  /** Direct estimate over raw rows — the reference answer the merge
    * path must reproduce. */
  def hllDirect(
      df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12, outName: String = "approx_distinct"): DataFrame = {
    val agg = hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK))).as(outName)
    if (keys.isEmpty) df.agg(agg)
    else df.groupBy(keys.map(col): _*).agg(agg)
  }
}
