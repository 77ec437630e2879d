package graft.core

/** Typed error surface — parity with the reference's sentinel errors
  * (ChronoBase pkg/db/errors.go): callers can match on failure kind
  * rather than parse messages. */
sealed abstract class ChronoException(msg: String) extends RuntimeException(msg)

final class TableNotFoundException(table: String)
  extends ChronoException(s"no such table: $table")

final class TableAlreadyExistsException(table: String)
  extends ChronoException(s"table exists: $table")

final class InvalidConfigException(detail: String)
  extends ChronoException(s"invalid config: $detail")

final class DatabaseLockedException(dir: String, detail: String = "")
  extends ChronoException(s"data dir already open (LOCK present): $dir" +
    (if (detail.isEmpty) "" else s" — $detail"))

final class DatabaseClosedException
  extends ChronoException("database is closed")

/** A typed-table schema that cannot be stored: chrono tables require a
  * `ts` TIMESTAMP column (the time-bucket axis), reserve `bucket` (the
  * partition column), and constrain `key` (when present) to STRING —
  * it feeds the Bloom/min-max key index family. */
final class InvalidSchemaException(detail: String)
  extends ChronoException(s"invalid table schema: $detail")

/** A key-indexed verb (queryKey / delete-by-key / upsert / bucketed
  * twin) invoked on a table whose declared schema has no `key` column. */
final class KeylessTableException(table: String, verb: String)
  extends ChronoException(
    s"table '$table' has no 'key' column — $verb requires one " +
      "(declare key STRING in the table schema)")

/** The streaming tail source's append-only contract, ENFORCED: a file
  * the stream already emitted has VANISHED from the `_manifest` —
  * maintenance (compact / deleteKeys / cleanup / restore) rewrote
  * history under a live tail, which a file-diff stream cannot represent
  * (the rewritten rows would silently re-emit). Fail the query loudly
  * instead; run maintenance on a tailed table only between streaming
  * queries. */
final class StreamRewriteException(detail: String)
  extends ChronoException(
    s"chrono tail source: previously-emitted data files vanished from " +
      s"_manifest — a maintenance verb (compact/delete/cleanup/restore) " +
      s"rewrote the table under a live tail. To stream a table that " +
      s"mutates, use the CHANGE FEED instead: readStream.format(" +
      s""""chrono").option("changeFeed", "true") — rewrites arrive as """ +
      s"row deltas there rather than failing the query (requires the " +
      s"writer to retain superseded files: trashGraceMs > 0). $detail")

/** A declared or sniffed bucket granularity disagrees with the bucket
  * labels actually on disk — planning with it would derive bucket
  * predicates in the wrong label format and silently prune EVERY
  * in-range file. Loud beats wrong. */
final class GranularityMismatchException(expected: String, label: String)
  extends ChronoException(
    s"bucket granularity '$expected' does not match on-disk bucket " +
      s"label '$label' (hour labels are yyyy-MM-dd-HH, day labels " +
      s"yyyy-MM-dd) — pass the correct 'granularity' option")

object ChronoConfigValidation {
  /** Parity with the reference's config validation (config.go:154-208):
    * reject unusable knob values at construction time. */
  def validate(c: ChronoConfig): Unit = {
    if (!Set("hour", "day").contains(c.bucket))
      throw new InvalidConfigException(s"bucket must be hour|day, got ${c.bucket}")
    c.ttl.foreach { t =>
      if (t <= 0) throw new InvalidConfigException(s"ttl must be positive, got $t")
    }
    if (!Set("zstd", "gzip", "snappy", "lz4", "none", "uncompressed")
        .contains(c.compression))
      throw new InvalidConfigException(s"unsupported codec ${c.compression}")
    if (c.compactFileThreshold < 1)
      throw new InvalidConfigException(
        s"compactFileThreshold must be >= 1, got ${c.compactFileThreshold}")
    if (c.writersPerBucket < 1)
      throw new InvalidConfigException(
        s"writersPerBucket must be >= 1, got ${c.writersPerBucket}")
    if (c.sketchLgK < 0 || c.sketchLgK > 21)
      throw new InvalidConfigException(
        s"sketchLgK must be 0 (off) or 4..21, got ${c.sketchLgK}")
    if (c.sketchCmsDepth < 0 || c.sketchCmsDepth > 16)
      throw new InvalidConfigException(
        s"sketchCmsDepth must be 0 (off) or 1..16, got ${c.sketchCmsDepth}")
    if (c.sketchCmsDepth > 0 && c.sketchCmsWidth < 2)
      throw new InvalidConfigException(
        s"sketchCmsWidth must be >= 2 when CMS is on, got ${c.sketchCmsWidth}")
    if (c.trashGraceMs < 0)
      throw new InvalidConfigException(
        s"trashGraceMs must be >= 0 (0 = off), got ${c.trashGraceMs}")
    if (c.lockLeaseMs < 100)
      throw new InvalidConfigException(
        s"lockLeaseMs must be >= 100 (heartbeats fire every lease/3), " +
          s"got ${c.lockLeaseMs}")
  }
}
