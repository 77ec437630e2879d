package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._

/** V1 `Filter` → `Column` translation for the catalog DML verbs —
  * the REVERSE of Spark's pushdown translation, small on purpose: the
  * SQL `DELETE FROM` path hands the connector the already-split
  * conjunction as data-source filters
  * ([[org.apache.spark.sql.connector.catalog.SupportsDelete]]), and the
  * facade's delete verbs want one [[Column]] predicate back. Filters
  * Spark could not translate to source filters never reach this layer —
  * the strategy refuses them loudly first (the documented contract: a
  * DELETE whose predicate cannot push down is not silently widened).
  *
  * Reference analog: the engine's own deleteKeys/deleteMatching verbs
  * (q51/d30) — this is the SQL front door to them. */
object V1Filters {

  private def c(name: String): Column = col(s"`$name`")

  /** The Column equivalent of a V1 filter, or None when the shape is
    * not one this connector serves. NULL semantics ride the Catalyst
    * twins (three-valued logic preserved: a NULL predicate never
    * selects a row for deletion). */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(c(a) === lit(v))
    case EqualNullSafe(a, v) => Some(c(a) <=> lit(v))
    case GreaterThan(a, v) => Some(c(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
    case LessThan(a, v) => Some(c(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(c(a) <= lit(v))
    case In(a, vs) => Some(c(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(c(a).isNull)
    case IsNotNull(a) => Some(c(a).isNotNull)
    case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(child) => toColumn(child).map(!_)
    case StringStartsWith(a, v) => Some(c(a).startsWith(v))
    case StringEndsWith(a, v) => Some(c(a).endsWith(v))
    case StringContains(a, v) => Some(c(a).contains(v))
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }

  /** The key-literal fast path: a conjunction that is exactly
    * `key = <s>` or `key IN (<s>...)` (modulo a redundant
    * `key IS NOT NULL` Spark may split out) routes to
    * [[graft.core.ChronoDB.deleteKeys]] — the Bloom-pruned erasure
    * verb — instead of the generic predicate scan. */
  def keyOnly(filters: Seq[Filter]): Option[Seq[String]] =
    filters.filterNot(_ == IsNotNull("key")) match {
      case Seq(EqualTo("key", v: String)) => Some(Seq(v))
      case Seq(In("key", vs)) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        Some(vs.toIndexedSeq.map(_.asInstanceOf[String]))
      case _ => None
    }
}
