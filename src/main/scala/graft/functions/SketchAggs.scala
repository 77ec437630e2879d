package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch-building aggregates for the ChronoDB sidecar write path.
  *
  * [[CmsDenseAgg]] builds a Count-Min counter table as ONE dense
  * `array<long>` of depth×width cells per group — the classic in-memory
  * CMS update loop (hash, increment, done) instead of the
  * explode-into-cell-rows relational formulation
  * ([[graft.operators.Sketches.cmsBuild]]). Same cells, same counts,
  * same portable hash pair ([[NativeExpressions.portableTokenHash]] —
  * reference semantics per ChronoBase's per-tablet stats intent,
  * table.go:390-414), so estimates stay oracle-replicable; only the
  * physical shape differs. The win at ingest: the whole counter table
  * rides the partial/final aggregation split as a single buffer — no
  * per-cell row explosion, no 100k-row hash-agg, and the sidecar job
  * collapses into whatever aggregation already runs per bucket.
  * Partial-agg state is depth×width×8 bytes per (task, group): size the
  * width against the bucket count a single batch can touch (hundreds of
  * KB at the defaults).
  *
  * [[LongVectorSumAgg]] is its merge counterpart for FOLDING persisted
  * counter rows (compact/cleanup): element-wise sum of `array<long>`
  * rows, null-skipping, so per-batch sidecar rows collapse to one per
  * bucket. CMS merge IS vector addition, which is why the fold is
  * lossless.
  */
object SketchAggs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Adaptive long-vector codec for aggregation-buffer shuffle: partial
    * CMS counter vectors are mostly ZEROS (a map task touches at most
    * depth×its-row-count of the depth×width cells), so buffers with
    * under ~1/3 nonzero cells ship as sparse (index, value) pairs —
    * 5-10× fewer shuffle bytes and final-merge work at ingest batch
    * sizes — and dense buffers ship as the plain vector. First byte
    * tags the format; both sides carry the length, so decode is
    * unambiguous. */
  private[functions] def serializeVec(buf: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0L) nz += 1; i += 1 }
    if (nz * 3 < buf.length) {
      val bb = ByteBuffer.allocate(1 + 8 + 12 * nz)
      bb.put(1.toByte).putInt(buf.length).putInt(nz)
      i = 0
      while (i < buf.length) {
        if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
        i += 1
      }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(1 + 8 * buf.length)
      bb.put(0.toByte)
      i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }
  }

  private[functions] def deserializeVec(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val tag = bb.get()
    if (tag == 1.toByte) {
      val len = bb.getInt()
      val nz = bb.getInt()
      val buf = new Array[Long](len)
      var i = 0
      while (i < nz) { val idx = bb.getInt(); buf(idx) = bb.getLong(); i += 1 }
      buf
    } else {
      val buf = new Array[Long]((bytes.length - 1) / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
      buf
    }
  }

  /** `cms_dense(key, depth, width)` — dense CMS counter vector of the
    * group's keys: cell (d, b) lives at index d*width + b. */
  def cmsDense(key: Column, depth: Int, width: Int): Column =
    column(CmsDenseAgg(expression(key), depth, width).toAggregateExpression())

  /** `vec_sum(arr)` — element-wise sum of equal-length long arrays;
    * null rows are skipped, all-null groups yield null. */
  def vecSum(arr: Column): Column =
    column(LongVectorSumAgg(expression(arr)).toAggregateExpression())
}

case class CmsDenseAgg(
    key: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms_dense: depth out of range: $depth")
  require(width >= 2, s"cms_dense: width out of range: $width")

  override def child: Expression = key

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val h = NativeExpressions.portableTokenHash(
        k.asInstanceOf[UTF8String].toString)
      val h1 = h >>> 31
      val h2 = h & 0x7FFFFFFFL
      var d = 0
      while (d < depth) {
        buf(d * width + ((h1 + d * h2) % width).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeVec(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeVec(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): CmsDenseAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsDenseAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsDenseAgg =
    copy(key = c)

  override def prettyName: String = "cms_dense"
}

case class LongVectorSumAgg(
    arr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def child: Expression = arr

  // empty array = "nothing seen yet" sentinel (eval → null)
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def add(buf: Array[Long], a: Array[Long]): Array[Long] =
    if (a.length == 0) buf
    else if (buf.length == 0) a
    else {
      require(buf.length == a.length,
        s"vec_sum: mismatched lengths ${buf.length} vs ${a.length}")
      var i = 0
      while (i < buf.length) { buf(i) += a(i); i += 1 }
      buf
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = arr.eval(input)
    if (v == null) buf
    else add(buf, v.asInstanceOf[ArrayData].toLongArray())
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    add(buf, other)

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeVec(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeVec(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(offset: Int): LongVectorSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LongVectorSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): LongVectorSumAgg =
    copy(arr = c)

  override def prettyName: String = "vec_sum"
}
