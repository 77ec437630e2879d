package graft.core

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan metric extraction for the self-validating prune
  * verdicts (d21/d21b/q56 pattern). AQE hides finalized subtrees behind
  * leaf nodes (AdaptiveSparkPlanExec / QueryStageExec /
  * ReusedExchangeExec), so a plain TreeNode.collect misses scans once a
  * plan contains an exchange — this walker unwraps each explicitly.
  * Call AFTER an action has materialized the plan. */
object PlanMetrics {
  def scannedFiles(p: SparkPlan): Long = p match {
    case a: AdaptiveSparkPlanExec => scannedFiles(a.executedPlan)
    case q: QueryStageExec => scannedFiles(q.plan)
    case r: ReusedExchangeExec => scannedFiles(r.child)
    case s: FileSourceScanExec => s.metrics("numFiles").value
    // the V2 path (ChronoCatalog tables plan BatchScanExec over a
    // FileScan): numFiles is a driver-side metric not present in the
    // exec's metric map — count the planned FilePartitions' files
    // directly (post-pruning, what the scan actually reads)
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
      b.inputRDD.partitions.collect {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions.collect {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.length
          }.sum
      }.sum.toLong
    case other => other.children.map(scannedFiles).sum
  }

  /** [[scannedFiles]] restricted to V1 scans whose file-index roots
    * contain `pathPart` — isolates ONE relation's post-pruning I/O in
    * a multi-scan plan (the ANN probe-pruning verdict: the inverted-
    * list scan must touch only the probed cells' files, whatever the
    * query side reads). */
  def scannedFilesUnder(p: SparkPlan, pathPart: String): Long = p match {
    case a: AdaptiveSparkPlanExec => scannedFilesUnder(a.executedPlan, pathPart)
    case q: QueryStageExec => scannedFilesUnder(q.plan, pathPart)
    case r: ReusedExchangeExec => scannedFilesUnder(r.child, pathPart)
    case s: FileSourceScanExec =>
      if (s.relation.location.rootPaths.exists(_.toString.contains(pathPart)))
        s.metrics("numFiles").value
      else 0L
    case other => other.children.map(scannedFilesUnder(_, pathPart)).sum
  }

  /** Shuffle-exchange count (broadcast exchanges excluded) — the d39
    * auto-routing verdict: a co-located key join + key agg must plan
    * ZERO of these. */
  def shuffleExchanges(p: SparkPlan): Long = p match {
    case a: AdaptiveSparkPlanExec => shuffleExchanges(a.executedPlan)
    case q: QueryStageExec => shuffleExchanges(q.plan)
    case r: ReusedExchangeExec => shuffleExchanges(r.child)
    case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      1L + s.children.map(shuffleExchanges).sum
    case other => other.children.map(shuffleExchanges).sum
  }
}
