package graft.core

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}

/** Test filesystem modeling a CONDITIONAL-PUT object store — the
  * documented `createExclusive` extension point (ChronoDB lock
  * scaladoc) made drivable:
  *
  *  - `createNewFile` is a REAL compare-and-swap (NIO O_EXCL — the
  *    If-None-Match PUT a store like S3 offers since 2024-12 / GCS
  *    x-goog-if-generation-match always did);
  *  - `rename` is deliberately NON-atomic: exists-check, copy bytes,
  *    a visible interleaving window (an optional barrier two racing
  *    threads meet inside), then delete-source — two racers can BOTH
  *    observe success, exactly the object-store hazard the takeover
  *    protocol documents.
  *
  * With this pair, LeaseLockSpec proves ABSOLUTE mutual exclusion on
  * stale-lock takeover: however the non-atomic renames interleave,
  * the CAS `createExclusive(lockPath)` admits exactly one winner and
  * the loser is refused at acquisition — no fencing poison needed
  * (fencing remains the story for stores with NO conditional
  * primitive at all). Backed by the local disk so every other
  * operation (sidecar writes, parquet IO) behaves normally; scheme
  * `casobj` keeps [[ChronoFs.createExclusive]] off its local-NIO
  * special case and on the `fs.createNewFile` path under test. */
class CasObjectFs extends RawLocalFileSystem {
  override def getScheme: String = "casobj"
  override def getUri: java.net.URI = java.net.URI.create("casobj:///")

  private def nio(p: HPath): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  // Raw-local's lazy permission loader builds java.io.File from the
  // status's URI and rejects any scheme but "file"; materialize plain
  // statuses from NIO attributes instead (permissions are irrelevant
  // to the protocol under test).
  private def status(p: HPath): org.apache.hadoop.fs.FileStatus = {
    val attrs = java.nio.file.Files.readAttributes(nio(p),
      classOf[java.nio.file.attribute.BasicFileAttributes])
    new org.apache.hadoop.fs.FileStatus(attrs.size(), attrs.isDirectory,
      1, getDefaultBlockSize(p), attrs.lastModifiedTime().toMillis,
      makeQualified(p))
  }

  override def getFileStatus(p: HPath): org.apache.hadoop.fs.FileStatus =
    if (!java.nio.file.Files.exists(nio(p)))
      throw new java.io.FileNotFoundException(p.toString)
    else status(p)

  override def listStatus(p: HPath): Array[org.apache.hadoop.fs.FileStatus] = {
    val t = nio(p)
    if (!java.nio.file.Files.exists(t))
      throw new java.io.FileNotFoundException(p.toString)
    if (!java.nio.file.Files.isDirectory(t)) return Array(status(p))
    val s = java.nio.file.Files.list(t)
    try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.map(c => status(new HPath(p, c.getFileName.toString)))
      .toArray
    finally s.close()
  }

  /** Conditional put: atomic create-if-absent, regardless of how many
    * racers arrive. */
  override def createNewFile(p: HPath): Boolean = {
    val t = nio(p)
    try {
      if (t.getParent != null) java.nio.file.Files.createDirectories(t.getParent)
      java.nio.file.Files.createFile(t)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  /** Object-store rename: copy + delete with a visible window. Two
    * racers moving the same source can BOTH return true (both read the
    * bytes before either deletes) — the non-atomicity under test. */
  override def rename(src: HPath, dst: HPath): Boolean = {
    val s = nio(src); val d = nio(dst)
    if (!java.nio.file.Files.exists(s)) return false
    if (java.nio.file.Files.exists(d)) return false
    try {
      if (java.nio.file.Files.isDirectory(s)) {
        // directories keep the raw (atomic) move — the hazard under
        // test is the small-file CAS path, and parquet dir moves would
        // otherwise need a deep copy
        return super.rename(src, dst)
      }
      val bytes = java.nio.file.Files.readAllBytes(s)
      CasObjectFs.awaitWindow() // interleaving point
      if (d.getParent != null) java.nio.file.Files.createDirectories(d.getParent)
      java.nio.file.Files.write(d, bytes)
      java.nio.file.Files.deleteIfExists(s) // second racer: already gone — still "success"
      true
    } catch {
      case _: java.io.IOException => false
    }
  }
}

object CasObjectFs {
  /** When armed (parties ≥ 2), every file rename parks inside its
    * copy/delete window until that many renames are in flight (or the
    * timeout passes) — the deterministic interleaving the takeover
    * race needs. Disarm after the race so ordinary IO runs full
    * speed. */
  @volatile private var barrier: Option[java.util.concurrent.CyclicBarrier] = None

  def arm(parties: Int): Unit =
    barrier = Some(new java.util.concurrent.CyclicBarrier(parties))

  def disarm(): Unit = barrier = None

  private def awaitWindow(): Unit = barrier.foreach { b =>
    try b.await(2, java.util.concurrent.TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
      case _: java.util.concurrent.BrokenBarrierException =>
    }
  }
}
