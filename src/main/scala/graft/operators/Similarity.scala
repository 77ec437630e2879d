package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Similarity search over an embedding column (SURVEY.md §2c D3).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the full corpus, cosine per pair, per-query top-k via window. The
  *    corpus side streams: no shuffle of the corpus, work is
  *    O(|corpus| × |queries|) but embarrassingly parallel; per-partition
  *    ranking would replace the window if |queries| × k grew large.
  *  - [[lshTopK]]: approximate scale path — random-hyperplane LSH buckets
  *    (SimHash-style signature over sign(dot(v, plane))); only vectors
  *    sharing a bucket in some band are compared. Planes are derived from
  *    a seeded deterministic hash, not Math.random, so plans are
  *    reproducible.
  */
object Similarity {

  /** Exact top-k neighbours per query vector.
    *
    * @param corpus  (id, embedding) rows
    * @param queries (id, embedding) rows — expected small; broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val joined = c.crossJoin(broadcast(q))
    val filtered =
      if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id"))
      else joined
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    filtered
      // native cosine — same fold order as VectorFunctions.cosine (bit-
      // identical, oracle-verified), ~20× faster than interpreted HOFs
      .withColumn("cos",
        graft.functions.NativeExpressions.cosineNative(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Exact top-k neighbours per query vector, aggregation-shaped: the
    * per-query top-k is a [[graft.functions.TopKByScoreAgg]] bounded-heap
    * aggregate instead of a window sort. Same rows as [[bruteForceTopK]]
    * (ties broken by smaller neighbour id in both), but the declarative
    * aggregate gets Spark's partial/final split: each map task reduces
    * its corpus slice to ≤k pairs before the shuffle, so per-query
    * shuffle volume is O(k × partitions) regardless of corpus size —
    * the window formulation shuffles every (query, candidate) row to
    * sort it. Prefer this form when |corpus| ≫ k.
    */
  def bruteForceTopKAgg(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val joined = c.crossJoin(broadcast(q))
    val filtered =
      if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id"))
      else joined
    filtered
      .withColumn("cos",
        graft.functions.NativeExpressions.cosineNative(col("__qv"), col("__cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.NativeExpressions.topKByScore(
        col("cos"), col("neighbor_id").cast("long"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * queries probe only the `nprobe` nearest cells — the classic
    * clustered-index alternative to LSH. At 100 TB the assignment is one
    * map over the corpus (centroids broadcast), and each query touches
    * ~nprobe/nlist of the data. Deterministic via fixed seed.
    *
    * @param queries expected small (broadcast against probed cells)
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("features", array_to_vector(col("vec")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(c.select(col("features")))

    val assigned = model.transform(c)
      .select(col("id"), col("vec"), col("prediction").as("cell"))

    // per-query nprobe nearest cells, via the same cosine expression
    val centers = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val centersDf = corpus.sparkSession.createDataFrame(centers)
      .toDF("cell", "center")

    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("cdist").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centersDf))
      .withColumn("cdist",
        graft.functions.NativeExpressions.cosineNative(col("qv"), col("center")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cos",
        graft.functions.NativeExpressions.cosineNative(col("qv"), col("vec")))
      .withColumnRenamed("id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF ANN with a deterministic SAMPLED coarse quantizer: the cells
    * are the corpus vectors with id < nlist (a standard IVF variant —
    * any fixed coarse quantizer works; sampling the corpus gives one
    * that is reproducible and, unlike fitted k-means centroids,
    * expressible in oracle SQL, which is why this is the DECLARED d3c
    * form while [[ivfTopK]] keeps the fitted-k-means path).
    *
    * Scale shape: the centroid set is collapsed to ONE broadcast row
    * holding an array of (cell, vector) structs, so both assignment and
    * probe selection are map-only passes (an argmax/sort over the
    * in-row array — no shuffle, no window over the corpus); only the
    * ~|corpus|·nprobe/nlist candidate rows shuffle for the per-query
    * ranking. Ties break toward the smaller cell id, mirrored exactly
    * in the oracle.
    */
  def ivfTopKSeeded(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cos = graft.functions.NativeExpressions.cosineNative _

    val cents = corpus.filter(col(idCol) < nlist)
      .agg(collect_list(struct(col(idCol).cast("int").as("cell"),
        col(vecCol).as("cv"))).as("cents"))
      .select(array_sort(col("cents")).as("cents"))

    // assignment: argmax cosine over the broadcast centroid array —
    // struct ordering (cos, -cell) makes array_max pick max cos with
    // ties toward the smaller cell
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cents))
      .withColumn("cell", array_max(transform(col("cents"), ct => struct(
        cos(col("vec"), ct.getField("cv")).as("cos"),
        (-ct.getField("cell")).as("negcell"),
        ct.getField("cell").as("cell")))).getField("cell"))
      .select(col("neighbor_id"), col("vec"), col("cell"))

    // per-query nprobe nearest cells: sort (-cos, cell) asc, slice
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("pc", slice(array_sort(transform(col("cents"), ct => struct(
        (-cos(col("qv"), ct.getField("cv"))).as("ncos"),
        ct.getField("cell").as("cell")))), 1, nprobe))
      .select(col("qid"), col("qv"), explode(col("pc")).as("p"))
      .select(col("qid"), col("qv"), col("p.cell").as("cell"))

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("qid"))
      .withColumn("cos", cos(col("qv"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Int8-quantized two-stage top-k: scan the CODES (one signed byte
    * per dimension — 1/4 the bytes of float32), rank candidates by
    * exact integer dot product, then rescore only the `candidates`
    * survivors per query with the true float cosine. This is the scalar
    * quantization memory-bandwidth play every large ANN system ships:
    * at 100 TB the code table is the hot scan (4× less I/O and cache
    * footprint) and float vectors are touched only through the
    * candidate join — here a BROADCAST of the tiny candidate set into
    * the float scan, so the corpus never shuffles. Quantization and the
    * integer ranking are bit-exact cross-engine (fixed-order IEEE
    * normalize + floor + clamp, then pure int64 math), so the whole
    * pipeline — not just the rescore — is oracle-checkable. */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      candidates: Int = 16): DataFrame = {
    import graft.functions.NativeExpressions.{cosineNative, int8Dot, int8Quantize}
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      int8Quantize(col(vecCol)).as("code"))
    val qcodes = queries.select(col(idCol).as("query_id"),
      int8Quantize(col(vecCol)).as("qcode"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    val cand = codes.crossJoin(broadcast(qcodes))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qdot", int8Dot(col("qcode"), col("code")))
      .filter(col("qdot").isNotNull)
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= candidates)
      .select(col("query_id"), col("neighbor_id"), col("qdot"))
    // rescore: candidates (|queries|×candidates rows — tiny) broadcast
    // into the float scans; the corpus side never shuffles
    val cFloat = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qFloat = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cFloat.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qFloat), Seq("query_id"))
      .withColumn("cos", cosineNative(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF × int8 composition — the production 100 TB recipe both halves
    * model alone: the sampled-quantizer IVF ([[ivfTopKSeeded]]) prunes
    * the corpus to ~nprobe/nlist of its cells, int8 codes
    * ([[quantizedTopK]]) rank candidates INSIDE the probed cells by
    * exact integer dot (1/4 the scan bytes of float32), and the float
    * cosine rescores only the `candidates` survivors per query.
    *
    * Scale shape: centroid set is ONE broadcast row (assignment and
    * probe selection are map-only); the candidate join moves only the
    * probed cells' (id, code) rows — codes, not float vectors; the
    * rescore joins the tiny survivor set back into the float scan via
    * broadcast, so the float corpus never shuffles. Every stage is
    * bit-exact cross-engine (fixed-order IEEE assignment cosine,
    * normalize+floor+clamp quantization, int64 ranking), so the whole
    * composed pipeline is oracle-checkable — see d3g in
    * NorthStarQueries.
    *
    * Zero-norm vectors have no int8 code (quantize yields null): they
    * drop from both the candidate ranking and the query side, exactly
    * as in [[quantizedTopK]] and the oracle's `WHERE nrm <> 0`.
    */
  def ivfQuantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, candidates: Int = 16): DataFrame = {
    import graft.functions.NativeExpressions.{cosineNative, int8Dot, int8Quantize}
    val cos = cosineNative _

    val cents = corpus.filter(col(idCol) < nlist)
      .agg(collect_list(struct(col(idCol).cast("int").as("cell"),
        col(vecCol).as("cv"))).as("cents"))
      .select(array_sort(col("cents")).as("cents"))

    // assignment (float argmax, ties toward the smaller cell — the
    // ivfTopKSeeded rule) + code computed in the SAME corpus pass: the
    // scan that partitions the corpus also emits the compact rank key
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cents))
      .withColumn("cell", array_max(transform(col("cents"), ct => struct(
        cos(col("vec"), ct.getField("cv")).as("cos"),
        (-ct.getField("cell")).as("negcell"),
        ct.getField("cell").as("cell")))).getField("cell"))
      .select(col("neighbor_id"), int8Quantize(col("vec")).as("code"),
        col("cell"))

    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("pc", slice(array_sort(transform(col("cents"), ct => struct(
        (-cos(col("qv"), ct.getField("cv"))).as("ncos"),
        ct.getField("cell").as("cell")))), 1, nprobe))
      .select(col("qid"), int8Quantize(col("qv")).as("qcode"),
        explode(col("pc")).as("p"))
      .select(col("qid"), col("qcode"), col("p.cell").as("cell"))

    val wCand = Window.partitionBy(col("qid"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("qid"))
      .withColumn("qdot", int8Dot(col("qcode"), col("code")))
      .filter(col("qdot").isNotNull)
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= candidates)
      .select(col("qid").as("query_id"), col("neighbor_id"), col("qdot"))

    // rescore: survivors (≤ |queries|×candidates rows) broadcast into
    // the float scans; the float corpus never shuffles
    val cFloat = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qFloat = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cFloat.join(broadcast(cand.select(col("query_id"), col("neighbor_id"))),
        Seq("neighbor_id"))
      .join(broadcast(qFloat), Seq("query_id"))
      .withColumn("cos", cosineNative(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Random-hyperplane signature — native Catalyst expression (tight
    * eval loop; the HOF formulation evaluates interpreted, ~10× slower).
    * Plane components are hash-derived from (bit, dim, seed), so plans
    * are deterministic and reproducible. */
  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", PAMI 2011) — the third production
    * compression path next to int8 ([[quantizedTopK]]) and IVF
    * ([[ivfTopKSeeded]]): the vector space is split into `m` subspaces
    * of `dim/m` dims, each subspace gets its own `ks`-entry codebook,
    * and a corpus vector is stored as `m` small codes (m bytes at
    * ks=256 — 32× smaller than float32 at dim=64). Queries rank the
    * whole corpus by ASYMMETRIC distance (ADC): exact query subvector
    * vs reconstructed centroid per subspace, summed — a per-query
    * lookup table of m×ks partial distances replaces every float
    * multiply against corpus data. Codebooks here are SAMPLED (the
    * first `ks` corpus vectors' subvectors — the d3c/d3e seeded-
    * centroid convention) rather than k-means-fitted, which keeps
    * every stage deterministic and cross-engine replicable; swap in
    * fitted codebooks for recall at production scale.
    *
    * Scale shape: the codebook is ONE broadcast row (ks rows of the
    * corpus); encoding is map-only over the corpus scan; ADC scoring
    * streams the (id, m-byte code) projection — the float corpus is
    * read once for encoding and once for the survivor rescore, and
    * NEVER shuffles; the only exchanges are the two per-query ranking
    * windows over narrow (qid, id, score) rows, the d3f shape. At
    * 100 TB the corpus-side scan bytes drop from dim×4 to m per row —
    * the difference between scanning 25 TB of floats and 0.1 TB of
    * codes per ANN batch.
    *
    * Determinism (the oracle contract): subspace distances are ordered
    * left folds of (float→double) arithmetic — `aggregate(zip_with(…))`
    * here, `list_reduce(list_transform(list_zip(…)))` in DuckDB — so
    * every distance, argmin (ties → smaller cell), ADC sum (ordered
    * fold over j), candidate rank, and the final [[graft.functions
    * .NativeExpressions.cosineNative]] rescore is bit-identical
    * cross-engine. L2 ADC on RAW vectors: no normalization divide, no
    * sqrt — squared distance ranks identically to distance.
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, subDim: Int = 8, ks: Int = 16,
      candidates: Int = 16): DataFrame = {
    import graft.functions.NativeExpressions.cosineNative
    require(m >= 1 && subDim >= 1 && ks >= 1, "pq: bad codebook shape")

    // squared L2 between subspace j of v and of cv — ordered double fold
    def subdist(v: Column, cv: Column, j: Column): Column =
      aggregate(
        zip_with(
          slice(v, j * subDim + 1, lit(subDim)),
          slice(cv, j * subDim + 1, lit(subDim)),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x)

    // codebook: the first ks corpus vectors, one broadcast row sorted
    // by cell so element_at(cents, cell+1) is the lookup
    val cents = corpus.filter(col(idCol) < ks)
      .agg(collect_list(struct(col(idCol).cast("int").as("cell"),
        col(vecCol).as("cv"))).as("cents"))
      .select(array_sort(col("cents")).as("cents"))

    // encode: per subspace, argmin-distance cell (ties → smaller cell)
    // — map-only, via the native kernel (same IEEE fold as the columnar
    // form and the oracle; the HOF formulation's per-centroid slice
    // allocation and boxing measured d3h at 2.0 s vs 0.94 s with the kernel)
    // under-length vectors encode to null — EXCLUDE them here: the
    // candidate window below orders by ad ASC, which in Spark is NULLS
    // FIRST, so a null ad would otherwise occupy the top candidate
    // slots ahead of every real neighbor
    val codes = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cents))
      .select(col("neighbor_id"),
        graft.functions.NativeExpressions.pqEncodeNative(
          col("vec"), col("cents"), m, subDim).as("code"))
      .filter(col("code").isNotNull)

    // ADC: the per-query LOOKUP TABLE lut[j][cell] of partial distances
    // (m×ks doubles, computed ONCE per query on the broadcast side)
    // replaces every float multiply against corpus data — scoring a
    // corpus row is m array lookups + an ordered m-term sum, not
    // m×subDim multiply-adds. Same values in the same fold order as
    // recomputing per pair, so the oracle replication is unchanged.
    val qSide = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(col("cents"), ct =>
            subdist(col("__qv"), ct.getField("cv"), j))).as("lut"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("ad").asc, col("neighbor_id"))
    val cand = codes.crossJoin(broadcast(qSide))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("ad",
        aggregate(
          transform(sequence(lit(0), lit(m - 1)), j =>
            element_at(element_at(col("lut"), (j + 1).cast("int")),
              element_at(col("code"), (j + 1).cast("int")) + 1)),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= candidates)
      .select(col("query_id"), col("neighbor_id"))

    // float rescore of the survivors — the quantizedTopK tail: tiny
    // candidate set broadcast into the float scans, exact cosine, top-k
    val cFloat = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qFloat = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cFloat.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qFloat), Seq("query_id"))
      .withColumn("cos", cosineNative(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  private def signature(vec: Column, numBits: Int, seed: Int): Column =
    graft.functions.NativeExpressions.hyperplaneSig(vec, numBits, seed)

  /** Bucketed approximate top-k: `bands` independent signatures of
    * `bitsPerBand` hyperplane bits each; candidates = pairs sharing any
    * band bucket; exact cosine re-rank of candidates.
    *
    * Skew guard: buckets beyond `maxBucket` members switch from full
    * quadratic expansion to chain+anchor pairing (see
    * [[Dedup.bucketPairs]]) — candidates for the capped tail degrade to
    * near-id neighbours, i.e. recall inside a degenerate bucket drops,
    * which is the right trade at corpus scale (a bucket that big means
    * the band's bits don't discriminate; raise bitsPerBand rather than
    * pay |bucket|² pairs). The cap also bounds the window buffer that
    * carries embedding payloads at maxBucket vectors per bucket.
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, bands: Int = 8, bitsPerBand: Int = 8, seed: Int = 42,
      maxBucket: Int = 1024, chainWidth: Int = 4): DataFrame = {

    val base = corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      signature(col(vecCol), bands * bitsPerBand, seed).as("sig"))

    // (band, bucket, id, vec) via one posexplode — per-band unions would
    // recompute the signature once per band
    val weights = array((0 until bitsPerBand).map(i => lit(1 << i)): _*)
    val buckets = base
      .select(col("id"), col("vec"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => aggregate(
            zip_with(
              slice(col("sig"), b * bitsPerBand + 1, lit(bitsPerBand)),
              weights, (bit, w) => bit * w),
            lit(0), (a, x) => a + x))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    // candidate pairs without a self-join (signature evaluated once —
    // see Dedup.bucketPairs), vectors carried as pair payload; cosine
    // computed once per unordered pair, then fanned to both directions
    val pairs = Dedup.bucketPairs(
        buckets.select(col("band"), col("bucket"), col("id"),
          col("vec").as("pl")), maxBucket, chainWidth)
      .withColumn("cos",
        graft.functions.NativeExpressions.cosineNative(col("pl_a"), col("pl_b")))
      .select(col("id_a"), col("id_b"), col("cos"))
    // fan each unordered pair to both directions via explode, NOT a
    // union of two selects — union branches would re-evaluate the whole
    // candidate lineage (signatures included) once per branch
    val sym = pairs
      .select(explode(array(
        struct(col("id_a").as("qid"), col("id_b").as("nid"), col("cos")),
        struct(col("id_b").as("qid"), col("id_a").as("nid"), col("cos")))).as("e"))
      .select(col("e.qid"), col("e.nid"), col("e.cos").as("cos"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    sym
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos"))
  }
}
