package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Optimizer rule: derive bucket-PARTITION predicates from `ts` bounds
  * over ChronoDB tables, so a plain `WHERE ts BETWEEN …` — DataFrame or
  * `chrono_` SQL view — prunes partition directories the way
  * [[graft.core.ChronoDB.query]] does by hand. The reference promises
  * exactly this UX (ChronoBase README.md:109-112 "advanced querying" over
  * its time-bucketed storage, db.go:155-162 Query(start, end)); the
  * Spark-first form is an injected relaxed conjunct that
  * FileSourceStrategy turns into partition pruning, with the original
  * `ts` comparison kept as the exact post-scan filter.
  *
  * Mechanics: the ChronoDB WRITE path stamps the stored `ts` field with
  * the table's bucket granularity under [[GranularityKey]] — parquet
  * footers round-trip Spark field metadata, so the tag reappears on the
  * read RELATION's own output attribute, the one place alias collapse
  * and column pruning cannot strip it (a view-level alias tag was tried
  * first and did not survive CollapseProject). For each Filter whose
  * condition bounds such a `ts` with timestamp literals, the rule folds
  * the conjuncts into [lo, hi] micros and injects
  * `bucket >= fmt(lo) AND bucket <= fmt(hi)` as a Filter DIRECTLY above
  * the leaf relation that owns the attribute — so the injection lands
  * on the scan even when intermediate Projects pruned `bucket` out, and
  * in a join it lands only on the side whose `ts` was bounded.
  *
  * Soundness: bucket labels are the UTC wall-clock truncation of ts
  * ("yyyy-MM-dd[-HH]", ChronoDB.bucketExpr), which is MONOTONE in ts
  * and lexicographically ordered (fixed-length, zero-padded), so
  * ts ∈ [lo, hi] implies bucket(ts) ∈ [fmt(lo), fmt(hi)] — the injected
  * conjunct is implied by the original and only ever removes partitions
  * that cannot match. Bounds are formatted with the same UTC rendering
  * the write path uses, independent of the session timezone. Guards:
  * literal bounds only, post-1970 instants only (lexicographic order
  * needs the zero-padded era), and a conjunct already present — in the
  * leaf's own Filter or in the outer condition after CombineFilters —
  * is never re-injected, so the rule reaches a fixed point.
  */
object BucketPruneRule extends Rule[LogicalPlan] {

  /** Metadata key the ChronoDB write path puts on `ts` ("hour"|"day"). */
  val GranularityKey = "graft.chrono.bucket"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def usOf(l: Literal): Option[Long] = l match {
    case Literal(v: Long, TimestampType) if v >= 0 => Some(v)
    case _ => None
  }

  /** (lower-bound candidates, upper-bound candidates) in epoch micros
    * for comparisons on `ts`. `>`/`<` relax to their inclusive forms —
    * the excluded endpoint's bucket may still hold admissible rows. */
  private def bounds(cond: Expression, ts: AttributeReference): (Seq[Long], Seq[Long]) = {
    val (los, his) = (Seq.newBuilder[Long], Seq.newBuilder[Long])
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
        if a.semanticEquals(ts) => usOf(l).foreach(los += _)
      case GreaterThan(a: AttributeReference, l: Literal)
        if a.semanticEquals(ts) => usOf(l).foreach(los += _)
      case LessThanOrEqual(a: AttributeReference, l: Literal)
        if a.semanticEquals(ts) => usOf(l).foreach(his += _)
      case LessThan(a: AttributeReference, l: Literal)
        if a.semanticEquals(ts) => usOf(l).foreach(his += _)
      case EqualTo(a: AttributeReference, l: Literal)
        if a.semanticEquals(ts) => usOf(l).foreach { u => los += u; his += u }
      // literal-on-the-left mirrors
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
        if a.semanticEquals(ts) => usOf(l).foreach(his += _)
      case GreaterThan(l: Literal, a: AttributeReference)
        if a.semanticEquals(ts) => usOf(l).foreach(his += _)
      case LessThanOrEqual(l: Literal, a: AttributeReference)
        if a.semanticEquals(ts) => usOf(l).foreach(los += _)
      case LessThan(l: Literal, a: AttributeReference)
        if a.semanticEquals(ts) => usOf(l).foreach(los += _)
      case EqualTo(l: Literal, a: AttributeReference)
        if a.semanticEquals(ts) => usOf(l).foreach { u => los += u; his += u }
      case _ =>
    }
    (los.result(), his.result())
  }

  /** UTC wall-clock bucket label of an epoch-micros instant — must
    * match ChronoDB.bucketExpr's rendering exactly. */
  private def fmt(us: Long, gran: String): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), 0, java.time.ZoneOffset.UTC)
    val p = if (gran == "hour") "yyyy-MM-dd-HH" else "yyyy-MM-dd"
    java.time.format.DateTimeFormatter.ofPattern(p).format(ldt)
  }

  /** Bucket-partition predicates implied by `ts` bounds in a pushed
    * filter set — the FILE-INDEX-side twin of this rule, for scan paths
    * whose pushdown runs before user optimizer rules (the V2 relation:
    * V2ScanRelationPushDown sits in an earlier optimizer batch than
    * extraOptimizations, so a rule-injected Filter arrives too late).
    * The index KNOWS its granularity, so the ts attribute is matched by
    * name+type, no metadata needed. Same soundness argument as the
    * rule: the derived conjunct is implied by the original bounds. */
  def derivedBucketFilters(
      dataFilters: Seq[Expression], gran: String,
      bucket: AttributeReference): Seq[Expression] = {
    if (dataFilters.isEmpty) return Seq.empty
    val cond = dataFilters.reduce(And)
    val tsAttrs = dataFilters.flatMap(_.references).collect {
      case a: AttributeReference
        if a.name == "ts" && a.dataType == TimestampType => a
    }.distinct
    tsAttrs.flatMap { ts =>
      val (los, his) = bounds(cond, ts)
      Seq(
        los.maxOption.map(u => GreaterThanOrEqual(bucket, Literal(fmt(u, gran)))),
        his.minOption.map(u => LessThanOrEqual(bucket, Literal(fmt(u, gran))))
      ).flatten
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // tagged ts attributes bounded by this condition (join-safe: the
      // injection below lands on the leaf OWNING each attribute)
      val tagged = cond.references.toSeq.collect {
        case a: AttributeReference
          if a.dataType == TimestampType &&
            a.metadata.contains(GranularityKey) => a
      }
      val present = conjuncts(cond)
      val newChild = tagged.foldLeft(child) { (c, ts) =>
        val gran = ts.metadata.getString(GranularityKey)
        val (los, his) = bounds(cond, ts)
        def extrasFor(leaf: LeafNode): Seq[Expression] =
          leaf.output.collectFirst {
            case b: AttributeReference
              if b.name == "bucket" && b.dataType == StringType => b
          }.toSeq.flatMap { b =>
            Seq(
              los.maxOption.map(u => GreaterThanOrEqual(b, Literal(fmt(u, gran)))),
              his.minOption.map(u => LessThanOrEqual(b, Literal(fmt(u, gran))))
            ).flatten
          }
        def owns(l: LeafNode) = l.output.exists(_.exprId == ts.exprId)
        def inject(p: LogicalPlan): LogicalPlan = p match {
          case fl @ Filter(c2, l: LeafNode) if owns(l) =>
            val already = conjuncts(c2) ++ present
            val missing = extrasFor(l)
              .filterNot(e => already.exists(_.semanticEquals(e)))
            if (missing.isEmpty) fl
            else Filter(missing.foldLeft(c2)(And(_, _)), l)
          case l: LeafNode if owns(l) =>
            val missing = extrasFor(l)
              .filterNot(e => present.exists(_.semanticEquals(e)))
            if (missing.isEmpty) l
            else Filter(missing.reduce(And(_, _)), l)
          case other => other.mapChildren(inject)
        }
        if (los.isEmpty && his.isEmpty) c else inject(c)
      }
      if (newChild eq child) f else Filter(cond, newChild)
  }
}
