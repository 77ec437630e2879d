package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The driver-local quantizer fit behind buildAnnIndex (r20): the
  * determinism contract is what makes `_ann` rebuilds reproducible, so
  * it is pinned directly — same sample/seed/k ⇒ bit-identical
  * centroids, whatever the thread schedule of the parallel assignment
  * step. */
class LocalKMeansSpec extends AnyFunSuite {

  private def blobs(n: Int): Array[Array[Float]] =
    Array.tabulate(n) { i =>
      // two orthogonal blobs with deterministic jitter (the
      // AnnIndexSpec fixture shape)
      Array.tabulate(8) { j =>
        ((if (j == i % 2) 1.0 else 0.0) + math.sin(i * 7 + j) * 0.1).toFloat
      }
    }

  test("bit-identical across repeated fits (parallel assignment must not reorder FP sums)") {
    val pts = blobs(5000)
    val a = LocalKMeans.fit(pts, 8, seed = 7L)
    val b = LocalKMeans.fit(pts, 8, seed = 7L)
    assert(a.length === 8)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("separates well-separated blobs (cluster quality floor)") {
    val pts = blobs(2000)
    val cents = LocalKMeans.fit(pts, 2, seed = 42L)
    assert(cents.length === 2)
    // each centroid must be dominated by one blob axis (0 or 1), and
    // the two centroids by different axes
    val axes = cents.map(c => if (c(0) > c(1)) 0 else 1).toSeq
    assert(axes.toSet === Set(0, 1),
      s"centroids did not split the blobs: ${cents.map(_.toSeq).toSeq}")
  }

  test("n <= k returns the points themselves; empty refuses") {
    val pts = blobs(3)
    val cents = LocalKMeans.fit(pts, 8, seed = 1L)
    assert(cents.map(_.toSeq).toSeq === pts.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      LocalKMeans.fit(Array.empty[Array[Float]], 4, seed = 1L)
    }
  }

  test("deterministic under different k and degenerate identical points") {
    // all-identical points: every distance is 0; the fit must still
    // return k centroids without dividing by zero or looping
    val same = Array.fill(100)(Array.fill(4)(0.5f))
    val cents = LocalKMeans.fit(same, 4, seed = 9L)
    assert(cents.length === 4)
    assert(cents.forall(_.toSeq == Seq(0.5f, 0.5f, 0.5f, 0.5f)))
  }
}
