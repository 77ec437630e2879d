package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with
  * `right.time <= left.time` on the same key (SURVEY.md §2c Q9 — the
  * time-series operator the reference's data model implies but never
  * implements).
  *
  * Implemented as union + tag + windowed last-ignore-nulls rather than a
  * range join: one shuffle on the key, O(n log n) within-partition sort,
  * no pairwise blow-up — this is the formulation that survives 100 TB
  * (a range join is O(left × right-per-key); this is linear after sort).
  * Right rows sort BEFORE left rows at equal timestamps, giving inclusive
  * (<=) semantics, matching the reference's inclusive bounds
  * (ChronoBase tablet.go:366-367).
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (forward-filled).
    * @param rightTieBreak column ordering right rows at equal ts so the
    *   winner among same-ts right rows is deterministic (max wins).
    * @return left rows (all original columns) + value columns; left rows
    *   with no prior right row carry nulls (left-outer as-of).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      valueCols: Seq[(String, String)], // (rightCol, outputName)
      rightTieBreak: Option[String] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val outNames = valueCols.map(_._2)

    // Keys keep their native type: a lossy cast (e.g. string → long)
    // would null out every key and silently forward-fill right values
    // across unrelated keys. Sides must agree on the key type up front;
    // integral widening is the only implicit alignment performed.
    val lkType = left.schema(leftKey).dataType
    val rkType = right.schema(rightKey).dataType
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (lk, rk) =
      if (lkType == rkType) (col(leftKey), col(rightKey))
      else if (integral.contains(lkType) && integral.contains(rkType))
        (col(leftKey).cast("long"), col(rightKey).cast("long"))
      else throw new IllegalArgumentException(
        s"as-of join key types must match: left $leftKey is $lkType, right $rightKey is $rkType")

    val tbType = rightTieBreak.map(c => right.schema(c).dataType).getOrElse(LongType)

    val l2 = left.select(
      (Seq(
        lk.as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb")) ++
        leftCols.map(c => col(c)) ++
        outNames.zip(valueCols.map(_._1)).map { case (o, rc) =>
          lit(null).cast(right.schema(rc).dataType).as(o)
        }): _*)

    val r2 = right.select(
      (Seq(
        rk.as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        rightTieBreak.map(c => col(c)).getOrElse(lit(0L).cast(tbType)).as("__tb")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map { case (rc, o) => col(rc).as(o) }): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l2.unionByName(r2)
      .select((Seq(col("__k"), col("__t"), col("__side"), col("__tb")) ++
        leftCols.map(col) ++
        outNames.map(o => last(col(o), ignoreNulls = true).over(w).as(o))): _*)

    filled.filter(col("__side") === 1)
      .select((leftCols ++ outNames).map(col): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `right.time >= left.time` on the same key — the "next observation"
    * form (pandas merge_asof direction='forward'). Same union+window
    * formulation and cost envelope as [[asOf]], mirrored: right rows
    * sort AFTER left rows at equal timestamps (inclusive >=), the frame
    * looks forward, and among same-ts right rows the SMALLEST tie-break
    * wins (first in frame order).
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      valueCols: Seq[(String, String)],
      rightTieBreak: Option[String] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val outNames = valueCols.map(_._2)
    val lkType = left.schema(leftKey).dataType
    val rkType = right.schema(rightKey).dataType
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (lk, rk) =
      if (lkType == rkType) (col(leftKey), col(rightKey))
      else if (integral.contains(lkType) && integral.contains(rkType))
        (col(leftKey).cast("long"), col(rightKey).cast("long"))
      else throw new IllegalArgumentException(
        s"as-of join key types must match: left $leftKey is $lkType, right $rightKey is $rkType")

    val tbType = rightTieBreak.map(c => right.schema(c).dataType).getOrElse(LongType)

    // __side: left 0, right 1 — at equal ts the left row's forward frame
    // (currentRow..following) must CONTAIN same-ts right rows
    val l2 = left.select(
      (Seq(
        lk.as("__k"),
        col(leftTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(tbType).as("__tb")) ++
        leftCols.map(c => col(c)) ++
        outNames.zip(valueCols.map(_._1)).map { case (o, rc) =>
          lit(null).cast(right.schema(rc).dataType).as(o)
        }): _*)

    val r2 = right.select(
      (Seq(
        rk.as("__k"),
        col(rightTime).as("__t"),
        lit(1).as("__side"),
        rightTieBreak.map(c => col(c)).getOrElse(lit(0L).cast(tbType)).as("__tb")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map { case (rc, o) => col(rc).as(o) }): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = l2.unionByName(r2)
      .select((Seq(col("__k"), col("__t"), col("__side"), col("__tb")) ++
        leftCols.map(col) ++
        outNames.map(o => first(col(o), ignoreNulls = true).over(w).as(o))): _*)

    filled.filter(col("__side") === 0)
      .select((leftCols ++ outNames).map(col): _*)
  }

  /** Nearest as-of join: for each left row, the right row minimizing
    * |right.time - left.time| on the same key (pandas merge_asof
    * direction='nearest'); ties between an equally-distant previous and
    * next observation resolve BACKWARD (the previous row wins),
    * matching pandas. Composed from the two verified directional forms
    * — two window passes over the same key shuffle, then a row-local
    * choose; no new join shape.
    */
  def asOfNearest(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      valueCols: Seq[(String, String)],
      rightTieBreak: Option[String] = None): DataFrame = {
    val back = asOf(left, right, leftKey, leftTime, rightKey, rightTime,
      valueCols.map { case (rc, o) => (rc, s"__b_$o") } :+ (rightTime -> "__bt"),
      rightTieBreak)
    val both = asOfForward(back, right, leftKey, leftTime, rightKey, rightTime,
      valueCols.map { case (rc, o) => (rc, s"__f_$o") } :+ (rightTime -> "__ft"),
      rightTieBreak)
    // distances in microseconds for timestamps (cast("long") on a
    // timestamp truncates to SECONDS — sub-second ties would corrupt),
    // days for dates, native arithmetic for numerics. The conversion is
    // applied to left ts AND the __bt/__ft copies of right ts, so both
    // time types must agree (same contract as the join keys) — deciding
    // from the left type alone would silently null a DateType right side.
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}
    val ltt = left.schema(leftTime).dataType
    val rtt = right.schema(rightTime).dataType
    if (ltt != rtt) throw new IllegalArgumentException(
      s"as-of nearest time types must match: left $leftTime is $ltt, right $rightTime is $rtt")
    val toNum: Column => Column = ltt match {
      case TimestampType => unix_micros
      case TimestampNTZType => c => unix_micros(c.cast(TimestampType))
      case DateType => c => unix_date(c).cast("long")
      case _: NumericType => identity
      case t => throw new IllegalArgumentException(
        s"as-of nearest needs a timestamp, date, or numeric time column; $leftTime is $t")
    }
    val lt = toNum(col(leftTime))
    // equal distance → backward wins (<=), matching pandas 'nearest'
    val pickBack = col("__ft").isNull ||
      (col("__bt").isNotNull &&
        lt - toNum(col("__bt")) <= toNum(col("__ft")) - lt)
    val chosen = valueCols.foldLeft(both) { case (df, (_, o)) =>
      df.withColumn(o, when(pickBack, col(s"__b_$o")).otherwise(col(s"__f_$o")))
    }
    chosen.select((left.columns.toSeq ++ valueCols.map(_._2)).map(col): _*)
  }

  /** As-of with tolerance: like [[asOf]], but a matched right row must
    * also satisfy `left.time - right.time <= tolerance` — the bounded-
    * lookback form real time-series joins need (a quote from last week
    * shouldn't fill today's trade). Matches outside tolerance become
    * nulls. */
  def asOfTolerance(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      valueCols: Seq[(String, String)],
      tolerance: String,
      rightTieBreak: Option[String] = None): DataFrame = {
    val withT = asOf(left, right, leftKey, leftTime, rightKey, rightTime,
      valueCols :+ (rightTime -> "__rt"), rightTieBreak)
    val inWindow = col("__rt").isNotNull &&
      col("__rt") >= col(leftTime) - expr(s"INTERVAL $tolerance")
    valueCols.foldLeft(withT) { case (df, (_, o)) =>
      df.withColumn(o, when(inWindow, col(o)))
    }.drop("__rt")
  }

  /** Inner-as-of: drop left rows with no prior right row. */
  def asOfInner(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      valueCols: Seq[(String, String)],
      rightTieBreak: Option[String] = None): DataFrame = {
    val out = asOf(left, right, leftKey, leftTime, rightKey, rightTime,
      valueCols, rightTieBreak)
    out.filter(valueCols.map(v => col(v._2).isNotNull).reduce(_ && _))
  }
}
