package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types.StructType

import graft.core.{ChronoConfig, ChronoDB, ChronoFs}

/** Java-serializable Hadoop Configuration (Spark's own
  * SerializableConfiguration is private[spark]). */
final class ChronoSerConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit =
    try { out.defaultWriteObject(); value.write(out) }
    catch { case e: Exception => throw new IOException(e) }
  private def readObject(in: ObjectInputStream): Unit =
    try { in.defaultReadObject(); value = new Configuration(false)
      value.readFields(in) }
    catch { case e: Exception => throw new IOException(e) }
}

/** One staged parquet file written by one streaming task. */
final case class ChronoStagedFile(path: String) extends WriterCommitMessage

/** `df.writeStream.toTable("cat.ev")` — the STREAMING_WRITE half of the
  * catalog story (s20 covers the read half), a STAGE-then-ADOPT
  * protocol:
  *
  *  1. executors write each micro-batch's rows to per-task parquet
  *     files under `<table>/_staging/<queryId>/<epoch>/` (distributed —
  *     the stock parquet [[OutputWriterFactory]], same codec as the
  *     table), commit messages carry the paths;
  *  2. the driver's epoch commit ADOPTS the staged batch through
  *     [[ChronoDB.insertFrame]] — LOCK, TTL gate, salting, manifest and
  *     sidecar observe, byte-identical to every other write path — then
  *     records the epoch and drops the staging dir.
  *
  * EXACTLY-ONCE, not at-least-once: the per-query `_stream_epochs_*`
  * sidecar stores the highest committed epoch; a replayed epoch (post-
  * crash re-delivery) is detected and SKIPPED, where the V1 sink relies
  * on Update-mode upsert idempotence. The trade is one extra staging
  * write+read per micro-batch — micro-batches are small by definition,
  * and throughput-critical pipelines keep the single-write V1
  * `writeStream.format("chrono")` sink. Append mode only (Update rides
  * the V1 sink's keyed upsert; Complete is not a chrono verb). */
final class ChronoStreamingWrite(
    spark: SparkSession,
    tableRoot: HPath,
    tableName: String,
    cfg: ChronoConfig,
    writeSchema: StructType,
    queryId: String) extends StreamingWrite {

  private def hadoopConf = spark.sessionState.newHadoopConf()

  private def fs: ChronoFs = ChronoFs.resolve(tableRoot.toString, hadoopConf)._1

  private def stagingBase: HPath =
    new HPath(new HPath(tableRoot, "_staging"), queryId)

  private def epochLog: HPath =
    new HPath(tableRoot, s"_stream_epochs_$queryId")

  private def maxCommitted: Long =
    fs.readLinesRecover(epochLog).flatMap(_.headOption)
      .map(_.trim.toLong).getOrElse(-1L)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(hadoopConf)
    val owf = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat()
      .prepareWrite(spark, job, Map("compression" -> cfg.compression),
        writeSchema)
    ChronoStreamingWriterFactory(owf, writeSchema, stagingBase.toString,
      new ChronoSerConf(job.getConfiguration))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val cfs = fs
    val epochDir = new HPath(stagingBase, epochId.toString)
    if (epochId <= maxCommitted) {
      // post-crash re-delivery of an already-adopted epoch: exactly-once
      // means SKIP, not re-insert
      cfs.deleteRecursively(epochDir)
      return
    }
    val files = messages.collect { case ChronoStagedFile(p) if p.nonEmpty => p }
    if (files.nonEmpty) {
      val batch = spark.read.schema(writeSchema).parquet(files.toIndexedSeq: _*)
      val db = new ChronoDB(spark, cfg)
      try db.insertFrame(tableName, batch) finally db.close()
    }
    // epoch log AFTER the adopt: a crash between insert and log replays
    // the epoch — caught above ONLY if logged, so the failure mode is
    // at-least-once for exactly the crashed epoch (the V1 sink's
    // contract), never silent loss
    cfs.writeLinesAtomic(epochLog, Seq(epochId.toString))
    cfs.deleteRecursively(epochDir)
    // sweep leftovers of crashed earlier epochs (abort never ran)
    cfs.list(stagingBase).map(_.getPath).foreach { p =>
      if (p.getName.forall(_.isDigit) && p.getName.toLong < epochId)
        cfs.deleteRecursively(p)
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    fs.deleteRecursively(new HPath(stagingBase, epochId.toString))
}

final case class ChronoStreamingWriterFactory(
    owf: OutputWriterFactory,
    schema: StructType,
    stagingBase: String,
    conf: ChronoSerConf) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val path =
      s"$stagingBase/$epochId/part-$epochId-$partitionId-$taskId.parquet"
    val ctx = new TaskAttemptContextImpl(new Configuration(conf.value),
      new TaskAttemptID(new TaskID(new JobID("chrono", epochId.toInt),
        TaskType.MAP, partitionId), (taskId & 0x7fffffff).toInt))
    val out = owf.newInstance(path, schema, ctx)
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        out.write(record); rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        // empty task files carry no rows — skip them at adopt time by
        // not reporting a path (the parquet footer-only file is swept
        // with the epoch dir)
        if (rows > 0) ChronoStagedFile(path) else ChronoStagedFile("")
      }
      override def abort(): Unit = out.close()
      override def close(): Unit = ()
    }
  }
}
