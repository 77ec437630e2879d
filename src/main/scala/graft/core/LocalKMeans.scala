package graft.core

/** Deterministic driver-local Lloyd k-means for the ANN coarse-quantizer
  * fit (OPTIMIZATION_r20: guide §1.2 step 1 / §5 "the driver should do
  * almost no data work" — almost: the fit input is a BOUNDED sample,
  * max(nlist·40, 10k) vectors ≈ 2.5 MB at dim 64, far under any driver
  * budget, while the Spark ML KMeans pipeline it replaces spent ~15
  * scheduled jobs (kmeans|| init passes + 10 iteration passes + the
  * sample persist/unpersist) on that same sample. The cluster does the
  * one unavoidable corpus pass (assignment/rewrite); the KB-scale fit
  * runs where it costs nothing.)
  *
  * Determinism contract (the `_ann` rebuild story): same sample in the
  * same order + same seed + same k ⇒ bit-identical centroids. All
  * arithmetic is fixed-order double accumulation; parallel assignment
  * uses FIXED chunk boundaries with partials merged in chunk order, so
  * thread scheduling cannot reorder any floating-point sum. Ties
  * (equidistant centers) go to the lower center index, matching the
  * family's (cos, -cell) rule downstream.
  *
  * Algorithm: k-means++ seeding (seeded java.util.Random), Lloyd
  * iterations with squared-Euclidean distance (the corpus embeddings
  * are L2-normalized, so nearest-centroid order matches the cosine
  * order the serve path uses — same note as Dedup.semanticClustersFitted),
  * empty clusters re-seeded from the point farthest from its assigned
  * center. Stops early when no assignment changes. */
private[graft] object LocalKMeans {

  /** Fit `k` centroids over `points` (each an equal-length float
    * vector). Returns min(k, points.length) centroids as float arrays
    * (the `_ann` sidecar stores floats; truncation here mirrors the
    * `model.clusterCenters.map(_.toFloat)` the ML path applied). */
  def fit(points: Array[Array[Float]], k: Int, seed: Long,
      maxIter: Int = 10): Array[Array[Float]] = {
    require(points.nonEmpty, "LocalKMeans.fit: empty sample")
    val n = points.length
    if (n <= k) return points.map(_.clone())
    val dim = points(0).length
    val rnd = new java.util.Random(seed)

    def d2(p: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val d = p(j) - c(j); s += d * d; j += 1 }
      s
    }

    // k-means++ seeding: first center uniform, then proportional to
    // the squared distance to the nearest chosen center.
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).map(_.toDouble)
    val minD2 = Array.ofDim[Double](n)
    var i = 0
    while (i < n) { minD2(i) = d2(points(i), centers(0)); i += 1 }
    var c = 1
    while (c < k) {
      var sum = 0.0
      i = 0; while (i < n) { sum += minD2(i); i += 1 }
      var pick = 0
      if (sum <= 0.0) pick = rnd.nextInt(n) // all points coincide
      else {
        var target = rnd.nextDouble() * sum
        i = 0
        var chosen = -1
        while (i < n && chosen < 0) {
          target -= minD2(i)
          if (target <= 0.0) chosen = i
          i += 1
        }
        pick = if (chosen < 0) n - 1 else chosen
      }
      centers(c) = points(pick).map(_.toDouble)
      i = 0
      while (i < n) {
        val d = d2(points(i), centers(c))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      c += 1
    }

    // Lloyd iterations. Assignment is embarrassingly parallel and pure;
    // mean recomputation folds FIXED chunks in chunk order (deterministic
    // double sums whatever the thread schedule).
    val assign = Array.fill[Int](n)(-1)
    val chunk = 4096
    val nChunks = (n + chunk - 1) / chunk
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      moved = false
      // parallel assignment (pure per-point; no FP accumulation races)
      val changed = java.util.stream.IntStream.range(0, nChunks).parallel()
        .mapToLong { ci =>
          val lo = ci * chunk
          val hi = math.min(lo + chunk, n)
          var nChanged = 0L
          var p = lo
          while (p < hi) {
            var best = 0
            var bestD = d2(points(p), centers(0))
            var cc = 1
            while (cc < k) {
              val d = d2(points(p), centers(cc))
              if (d < bestD) { bestD = d; best = cc } // strict: ties → lower idx
              cc += 1
            }
            if (assign(p) != best) { assign(p) = best; nChanged += 1 }
            p += 1
          }
          nChanged
        }.sum()
      moved = changed > 0
      if (moved) {
        // sequential chunk-ordered fold: deterministic mean sums
        val sums = Array.ofDim[Double](k, dim)
        val counts = Array.ofDim[Long](k)
        var ci = 0
        while (ci < nChunks) {
          val lo = ci * chunk
          val hi = math.min(lo + chunk, n)
          var p = lo
          while (p < hi) {
            val a = assign(p)
            counts(a) += 1
            val row = sums(a); val pt = points(p)
            var j = 0
            while (j < dim) { row(j) += pt(j); j += 1 }
            p += 1
          }
          ci += 1
        }
        var cc = 0
        while (cc < k) {
          if (counts(cc) == 0L) {
            // re-seed an emptied cluster from the point farthest from
            // its assigned center (deterministic argmax, ties → lower
            // point index)
            var far = 0; var farD = -1.0
            i = 0
            while (i < n) {
              val d = d2(points(i), centers(assign(i)))
              if (d > farD) { farD = d; far = i }
              i += 1
            }
            centers(cc) = points(far).map(_.toDouble)
            assign(far) = cc
            moved = true
          } else {
            val row = sums(cc)
            var j = 0
            while (j < dim) { centers(cc)(j) = row(j) / counts(cc); j += 1 }
          }
          cc += 1
        }
      }
      it += 1
    }
    centers.map(_.map(_.toFloat))
  }
}
