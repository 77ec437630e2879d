package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-(bucket, time-slot) rollup state for the `_rollup` continuous
  * aggregate: exact row count, non-null value count, and Long
  * sum/min/max of the configured value expression. All counters are
  * ADDITIVE (min/max are semilattice), so rows from any number of
  * insert batches fold losslessly — the property that makes the
  * sidecar a continuous aggregate rather than a cache. */
final class RollupState(
    var n: Long,
    var nv: Long,
    var sum: Long,
    var vmin: Long,
    var vmax: Long)

object RollupAggs {
  /** `time_rollup(bucket, ts, value)` — the whole per-(bucket, slot)
    * rollup table as ONE global aggregate, so it rides
    * `Dataset.observe` on the ingest write exactly like
    * [[SketchAggs.bucketStats]]: zero extra passes over the batch.
    * `slotUs` is the slot width in microseconds (hour = 3.6e9). */
  def timeRollup(bucket: Column, ts: Column, value: Column,
      slotUs: Long): Column =
    column(TimeRollupAgg(expression(bucket), expression(ts),
      expression(value), slotUs).toAggregateExpression())
}

/** The observe-riding build side of the `_rollup` sidecar (see
  * [[graft.core.ChronoDB]]): buffers a HashMap (bucket, slot) →
  * [[RollupState]], merged by the accumulator protocol. NULL bucket or
  * ts rows are skipped entirely; a NULL value still counts into `n`
  * (the consistency anchor vs `_stats.n`) but not into nv/sum/min/max
  * — so `sum(n)` over a bucket's slots always equals the bucket's row
  * count regardless of value nullability. */
case class TimeRollupAgg(
    bucket: Expression,
    ts: Expression,
    value: Expression,
    slotUs: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.HashMap[(UTF8String, Long), RollupState]]
  with TernaryLike[Expression] {

  require(slotUs > 0, s"time_rollup: slotUs must be positive, got $slotUs")

  override def first: Expression = bucket
  override def second: Expression = ts
  override def third: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    if (bucket.dataType == StringType && ts.dataType == TimestampType &&
        value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "time_rollup requires (STRING bucket, TIMESTAMP ts, BIGINT value), " +
        s"got (${bucket.dataType.catalogString}, " +
        s"${ts.dataType.catalogString}, ${value.dataType.catalogString})")

  private type Buf =
    scala.collection.mutable.HashMap[(UTF8String, Long), RollupState]

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val b = bucket.eval(input)
    val t = ts.eval(input)
    if (b != null && t != null) {
      val bu = b.asInstanceOf[UTF8String]
      val slot = Math.floorDiv(t.asInstanceOf[Long], slotUs) * slotUs
      // same aliasing discipline as BucketStatsAgg: probe with the live
      // reference, clone only when storing a new map key
      val st = buf.getOrElse((bu, slot), null) match {
        case null =>
          val fresh = new RollupState(0L, 0L, 0L, Long.MaxValue, Long.MinValue)
          buf.put((bu.clone(), slot), fresh)
          fresh
        case s => s
      }
      st.n += 1L
      val v = value.eval(input)
      if (v != null) {
        val vl = v.asInstanceOf[Long]
        st.nv += 1L
        st.sum += vl
        if (vl < st.vmin) st.vmin = vl
        if (vl > st.vmax) st.vmax = vl
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (k, o) =>
      buf.getOrElse(k, null) match {
        case null => buf.put(k, o)
        case s =>
          s.n += o.n
          s.nv += o.nv
          s.sum += o.sum
          if (o.vmin < s.vmin) s.vmin = o.vmin
          if (o.vmax > s.vmax) s.vmax = o.vmax
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val rows = buf.toArray.map { case ((b, slot), st) =>
      new GenericInternalRow(Array[Any](
        b, slot, st.n, st.nv, st.sum,
        if (st.nv == 0L) null else st.vmin,
        if (st.nv == 0L) null else st.vmax))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toArray
    val size = 4 + entries.map { case ((b, _), _) => 4 + b.numBytes() + 48 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case ((b, slot), st) =>
      val bk = b.getBytes
      bb.putInt(bk.length).put(bk)
      bb.putLong(slot).putLong(st.n).putLong(st.nv)
        .putLong(st.sum).putLong(st.vmin).putLong(st.vmax)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val bk = new Array[Byte](bb.getInt()); bb.get(bk)
      val slot = bb.getLong()
      buf.put((UTF8String.fromBytes(bk), slot),
        new RollupState(bb.getLong(), bb.getLong(), bb.getLong(),
          bb.getLong(), bb.getLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", StringType, nullable = false),
    StructField("slot_us", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("nv", LongType, nullable = false),
    StructField("sum", LongType, nullable = false),
    StructField("vmin", LongType, nullable = true),
    StructField("vmax", LongType, nullable = true))), containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): TimeRollupAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TimeRollupAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TimeRollupAgg =
    copy(bucket = f, ts = s, value = t)

  override def prettyName: String = "time_rollup"
}
