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

final class DatabaseLockedException(dir: String)
  extends ChronoException(s"data dir already open (LOCK present): $dir")

final class DatabaseClosedException
  extends ChronoException("database is closed")

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
  }
}
