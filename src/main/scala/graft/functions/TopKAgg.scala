package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs under the
  * total order "better = higher score, then smaller id". Implemented as
  * a binary min-heap ordered weakest-first, so admission against a full
  * buffer is one O(1) peek + O(log k) sift and memory is a flat
  * 2k-doubles footprint regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays, heap-ordered weakest-first (smaller score, then
  // larger id, is weaker)
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)
  private[functions] var size = 0

  private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (weaker(scores(pos), ids(pos), scores(parent), ids(parent))) {
        val ts = scores(pos); val ti = ids(pos)
        scores(pos) = scores(parent); ids(pos) = ids(parent)
        scores(parent) = ts; ids(parent) = ti
        pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1; val r = l + 1
      var m = pos
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) return
      val ts = scores(pos); val ti = ids(pos)
      scores(pos) = scores(m); ids(pos) = ids(m)
      scores(m) = ts; ids(m) = ti
      pos = m
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (java.lang.Double.isNaN(score)) return
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && weaker(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  def mergeFrom(other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
    this
  }

  /** Kept pairs, strongest first (score desc, id asc). */
  def sortedPairs(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

/** Exact top-k-by-score aggregate (SURVEY.md §4 "custom, optional,
  * perf-only (a)"): `topk_by_score(score, id, k)` returns the k best
  * (score, id) pairs as `array<struct<score double, id bigint>>`,
  * strongest first, ties broken by smaller id — fully deterministic.
  *
  * This is the aggregation-shaped scale path for D3 similarity search
  * (SURVEY.md §2c sizing note "per-partition heap + treeReduce-style
  * final"): as a declarative aggregate it gets Spark's partial/final
  * split for free, so each map task reduces its slice of the corpus to
  * ≤k pairs before the shuffle — per-group shuffle volume is O(k ×
  * partitions), independent of corpus size, where the window/row_number
  * formulation shuffles every candidate row to sort it. NULL and NaN
  * scores are skipped (a window formulation would rank them).
  */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"topk_by_score: k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer =
    buf.mergeFrom(other)

  override def eval(buf: TopKBuffer): Any = {
    val pairs = buf.sortedPairs()
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "topk_by_score"
}
