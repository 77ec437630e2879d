package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (`transform` / `zip_with` /
  * `aggregate`) — no UDFs, so the expressions stay inside whole-stage
  * codegen and are usable at 100 TB.
  *
  * All folds are explicit left-to-right with a 0.0 double seed; this
  * pins the FP accumulation order, making results reproducible across
  * engines and across Spark re-partitionings (the fold happens per-row,
  * not across rows).
  */
object VectorFunctions {

  /** Left-fold sum of a double array. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    foldSum(transform(a, x => x.cast("double") * x.cast("double")))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(d / (na * nb))
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(foldSum(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    })))
}
