package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Kernel-level properties of the PQ encoder (no Spark session): the
  * tight-loop [[Kernels.pqEncode]] must agree with an INDEPENDENTLY
  * WRITTEN reference (Scala collections, foldLeft, minBy on the
  * (distance, cell) tuple — the array_min struct-order definition) on
  * random vectors, codebooks, and subspace shapes. Catches offset
  * arithmetic, tie handling, and struct-field-order bugs that the
  * fixture-based specs could miss; bit-exactness matters because the
  * codes are oracle-replicated. */
object PqProps extends Properties("pq") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private def refEncode(v: Array[Float], cents: Seq[(Int, Array[Float])],
      m: Int, sub: Int): Array[Int] =
    (0 until m).map { j =>
      cents.map { case (cell, cv) =>
        val d = (0 until sub).foldLeft(0.0) { (acc, i) =>
          val diff = v(j * sub + i).toDouble - cv(j * sub + i).toDouble
          acc + diff * diff
        }
        (d, cell)
      }.min._2
    }.toArray

  private def kernelEncode(v: Array[Float], cents: Seq[(Int, Array[Float])],
      m: Int, sub: Int): Array[Int] = {
    val centsData = new GenericArrayData(cents.map { case (cell, cv) =>
      new GenericInternalRow(Array[Any](cell, ArrayData.toArrayData(cv)))
    }.toArray[Any])
    val out = Kernels.pqEncode(ArrayData.toArrayData(v), centsData, m, sub)
    if (out == null) null else out.toIntArray()
  }

  private val shape: Gen[(Int, Int)] = for {
    m <- Gen.choose(1, 6)
    sub <- Gen.choose(1, 5)
  } yield (m, sub)

  private def vecOf(dim: Int): Gen[Array[Float]] =
    // a coarse value grid makes distance TIES common — the tie-break
    // path gets real coverage instead of never firing
    Gen.listOfN(dim, Gen.choose(-2, 2).map(_.toFloat)).map(_.toArray)

  property("kernel == independent reference (incl. ties)") =
    forAll(shape.flatMap { case (m, sub) =>
      val dim = m * sub
      for {
        v <- vecOf(dim)
        ks <- Gen.choose(1, 8)
        cvs <- Gen.listOfN(ks, vecOf(dim))
      } yield (v, cvs.zipWithIndex.map { case (cv, i) => (i, cv) }, m, sub)
    }) { case (v, cents, m, sub) =>
      kernelEncode(v, cents, m, sub).toSeq ==
        refEncode(v, cents, m, sub).toSeq
    }

  property("under-length vector and empty codebook yield null, not garbage") =
    forAll(shape) { case (m, sub) =>
      val dim = m * sub
      val v = Array.fill(dim)(1.0f)
      val short = kernelEncode(v.take(math.max(0, dim - 1)),
        Seq((0, v)), m, sub)
      val empty = kernelEncode(v, Seq.empty, m, sub)
      (dim == 0 || short == null) && empty == null
    }
}
