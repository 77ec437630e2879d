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

  /** The depth Count-Min cells of a string key: array of (d, bucket)
    * with bucket_d = (h1 + d·h2) mod width — Kirsch–Mitzenmacher double
    * hashing over the portable token-hash pair, so an external oracle
    * recomputes identical cells (same reason the MinHash family avoids
    * engine-private hashes). h1 < 2^31 and d·h2 < depth·2^31: no
    * overflow for any sane depth. */
  private def cmsCells(key: Column, depth: Int, width: Int): Column = {
    val h = graft.functions.NativeExpressions.tokenHash62(key)
    val h1 = shiftrightunsigned(h, 31)
    val h2 = h.bitwiseAND(lit(0x7FFFFFFFL))
    array((0 until depth).map(d =>
      struct(lit(d).as("d"), ((h1 + lit(d.toLong) * h2) % width).as("bucket"))): _*)
  }

  /** Count-Min sketch of string-key frequencies: depth×width counters,
    * counter(d, b) = Σ count of keys hashing to bucket b in row d. The
    * build explodes each row's depth cells map-side and sums in ONE
    * aggregation — partial aggregation (map-side combine on the
    * ≤ depth×width cell space) is the hot-key absorber: a hot key hits
    * the SAME depth cells every time, so its instance stream collapses
    * inside each map task and the shuffle moves at most
    * min(depth×rows, depth×width) cells per task. (An earlier shape
    * pre-aggregated per key first; that second full shuffle bought
    * nothing the cell-level combine doesn't already guarantee, and at
    * ingest rates it DOUBLED the sidecar's shuffle cost.) Kilobytes of
    * state at any corpus size; mergeable (counter tables add), like the
    * HLL path.
    */
  def cmsBuild(
      df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64,
      weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    df.select(explode(cmsCells(col(keyCol), depth, width)).as("cell"),
        weight.as("__cnt"))
      .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .agg(sum(col("__cnt")).as("cnt"))
  }

  /** Grouped Count-Min build: one counter table per `groupCols` value
    * (e.g. per time bucket) — the persistable form. Same single-shuffle
    * explode-then-combine shape as [[cmsBuild]] with the group key
    * carried through; output (groupCols..., d, bucket, cnt). Counter
    * tables for different groups MERGE by plain addition (groupBy(d,
    * bucket) over any group subset), which is how a range query
    * assembles its sketch. */
  def cmsBuildBy(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      depth: Int = 4, width: Int = 64,
      weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    df.select(groupCols.map(col) :+
        explode(cmsCells(col(keyCol), depth, width)).as("cell") :+
        weight.as("__cnt"): _*)
      .groupBy(groupCols.map(col) :+ col("cell.d").as("d") :+
        col("cell.bucket").as("bucket"): _*)
      .agg(sum(col("__cnt")).as("cnt"))
  }

  /** Point estimates from a Count-Min sketch: est(key) = min over rows
    * of its counter — ALWAYS ≥ the true count (counters only ever add
    * other keys' mass; the d17 declared query asserts the bound as an
    * output column). The counter table is tiny, so the probe join
    * broadcasts; keys absent from the sketch estimate 0 via the left
    * join. `depth`/`width` must match the build. */
  def cmsEstimate(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame =
    keys.select(col(keyCol),
        explode(cmsCells(col(keyCol), depth, width)).as("cell"))
      .join(broadcast(sketch),
        col("cell.d") === sketch("d") && col("cell.bucket") === sketch("bucket"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
