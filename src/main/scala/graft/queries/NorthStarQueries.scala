package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.{NativeExpressions, TextFunctions}
import graft.operators.{Curation, Dedup, Fusion, Layout, Multimodal, Similarity, Sketches, Stats}

/** LLM-data-pipeline operators (SURVEY.md §2c D1–D5): dedup family,
  * similarity search, text analysis, multimodal plumbing. */
object NorthStarQueries {
  import Tables.t

  /** D1: exact dedup by content hash (hash-partitioned aggregate). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("content_hash"))

  /** D2: MinHash+LSH near-dup pairs, exact-Jaccard verified. The oracle
    * is brute-force all-pairs Jaccard ≥ τ: valid because the LSH stage
    * only prunes CANDIDATES and the final filter is the exact Jaccard —
    * on the fixture every qualifying pair has j ≥ 0.89, where the
    * 16-band/4-row banding's miss probability is (1-j⁴)¹⁶ < 1e-7, so
    * candidate recall is 1.0 and LSH+verify ≡ brute force+verify. */
  def minhashNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(t(spark, dir, "documents"), "doc_id", "text",
        shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** D2b: SimHash near-dup pairs. Exactly oracle-checkable: the token
    * hash is a portable polynomial pair (NativeExpressions
    * .portableTokenHash), so DuckDB recomputes identical signatures, and
    * the oracle replicates the candidate condition (some 16-bit chunk
    * equal) verbatim — the check covers the banding itself, not just the
    * verify step. Recall semantics: the 4-chunk banding GUARANTEES
    * candidates for Hamming ≤ 3 (pigeonhole); distances 4–8 are
    * best-effort (missed only when all four chunks differ), and the
    * oracle checks the operator AS DEFINED — banding misses identically
    * on both engines. */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(t(spark, dir, "documents"), "doc_id", "text",
        maxHamming = 8)
      .orderBy(col("id_a"), col("id_b"))

  /** D2c: exact n-gram (3-shingle) Jaccard between consecutive doc pairs
    * — SQL-oracle-able exact similarity (the verify step of near-dup). */
  def ngramJaccardQ(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val a = d.select(col("doc_id").as("id_a"), col("text").as("text_a"))
    val b = d.select((col("doc_id") - 1).as("id_a"),
      col("doc_id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("id_a"))
      .withColumn("jaccard",
        round(Dedup.shingleJaccard(col("text_a"), col("text_b"), 3), 6))
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"))
  }

  /** D27: EXACT all-pairs set-similarity join (3-shingle Jaccard ≥
    * 1/2) via prefix filtering — recall 1 by theorem, so the oracle is
    * the brute-force all-pairs join while the engine touches only
    * rare-prefix candidate pairs (see [[Dedup.setSimJoinPrefix]]). */
  def setSimJoinQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.setSimJoinPrefix(t(spark, dir, "documents"), "doc_id", "text",
        shingleK = 3, pNum = 1, pDen = 2)
      .orderBy(col("id_a"), col("id_b"))

  /** D3: brute-force exact cosine top-k (query set = vec_id < 8).
    * Bit-exact oracle parity via explicit left-fold dot/norm. */
  def similarityTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** D3d: same exact top-k as D3 but through the bounded-heap UDAF
    * (TopKByScoreAgg) — partial aggregation caps per-query shuffle
    * volume at k×partitions; identical rows to the window form. */
  def similarityTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopKAgg(
        emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** D3c: IVF ANN — the clustered-index scale path, declared over the
    * deterministic sampled coarse quantizer (centroids = vectors with
    * vec_id < nlist) so the full pipeline — assignment argmax, probe
    * selection, candidate ranking — is replicated verbatim in the
    * DuckDB oracle. The fitted-k-means quantizer ([[Similarity.ivfTopK]])
    * stays the library path with recall asserted in SimilaritySpec. */
  def similarityIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfTopKSeeded(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
      .orderBy(col("query_id"), col("rank"))
  }

  /** D3e: the FITTED-k-means IVF path (Similarity.ivfTopK) — the
    * quantizer users should actually run — declared with a q22-style
    * self-validating verdict. Fitted centroids are float aggregates, so
    * they are not ulp-stable across partitionings and cannot be oracle
    * literals; instead the query computes exact top-5 (brute force) and
    * IVF top-5 side by side and emits ONE row: the (SQL-exact) query
    * count, k, and an in-query recall verdict. Threshold 0.4 sits far
    * under the measured mean overlap (3.4–3.7 of 5 at sf0.001/0.01
    * with nlist=16, nprobe=6), so k-means jitter cannot flip the row;
    * per-path recall is additionally asserted in SimilaritySpec. */
  def similarityIvfFitted(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 32)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 6)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    queries.agg(count(lit(1)).as("n_queries"))
      .crossJoin(hits)
      .select(col("n_queries"), lit(5).as("k"),
        (col("n_hit") >= col("n_queries") * 2).as("recall_ok"))
  }

  /** D44: the PERSISTENT ANN index lifecycle (VERDICT r18 Missing #3)
    * — [[graft.core.ChronoDB.buildAnnIndex]] fits the d3e-class
    * k-means quantizer ONCE and stores it with the table (`_ann`
    * centroids + `_ann_cells` cell-partitioned inverted lists), so
    * serving ([[graft.core.ChronoDB.annTopK]]) reads KB of centroids
    * plus only the probed cells' directories — no per-query fit, no
    * corpus scan. Gate flow, all verdicts computed EAGERLY in driver
    * order: build → compact (content-preserving: the index must keep
    * serving, "folded by compact") → recall vs in-query brute force
    * (d3e threshold margin) → an INSERT keeps serving LIVE through the
    * delta union (VERDICT r19 #1: plain ingest is the engine's core
    * loop and must not stale the index) and the planted post-build
    * duplicate must actually SURFACE as a neighbor → a row REWRITE
    * (delete) must flip the index unservable and make annTopK REFUSE
    * (the stored lists may carry vanished vectors) →
    * buildAnnIndexIfStale rebuilds from stored parameters → serves
    * again. One self-validating row: the SQL-exact query count anchors
    * the hash, the booleans pin the lifecycle. */
  def annIndexServeQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB}
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("d44_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      compactFileThreshold = 1))
    try {
      val emb = t(spark, dir, "embeddings")
      val withTs = emb.select(col("vec_id"),
        to_timestamp(lit("2024-01-01 10:00:00")).as("ts"),
        col("embedding"))
      graft.core.BenchPhases.setup {
        db.createTable("e", StructType(Seq(
          StructField("vec_id", LongType),
          StructField("ts", TimestampType),
          StructField("embedding", ArrayType(FloatType)))))
        // two batches → a fragmented bucket, so compact has a victim
        db.insertFrame("e", withTs.filter(col("vec_id") % 2 === 0))
        db.insertFrame("e", withTs.filter(col("vec_id") % 2 === 1))
      }
      graft.core.BenchPhases.phase("1_build") {
        db.buildAnnIndex("e", "vec_id", "embedding", nlist = 16, seed = 42L)
      }
      val survivesCompact = graft.core.BenchPhases.phase("2_compact") {
        db.compact("e")
        db.annIndexFresh("e")
      }
      val tbl = db.table("e")
      val queries = tbl.filter(col("vec_id") < 32)
      val (nHit, nQ) = graft.core.BenchPhases.phase("3_recall_serve") {
        val exact = Similarity.bruteForceTopK(tbl, queries,
            "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        val approx = db.annTopK("e", queries, k = 5, nprobe = 6)
          .select(col("query_id"), col("neighbor_id"))
        (exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi").count(), queries.count())
      }
      val recallOk = nHit >= nQ * 2 // the d3e margin (measured 3.4+/5)
      // an INSERT serves LIVE (r19 #1): plant query 0's exact vector
      // under a fresh id — the delta union must surface it at cos 1
      // with NO rebuild (the index is verifiably delta-stale)
      val servesThroughInsert =
        graft.core.BenchPhases.phase("4_insert_delta_serve") {
          db.insertFrame("e", withTs.filter(col("vec_id") === 0)
            .select((col("vec_id") + 1000000L).as("vec_id"), col("ts"),
              col("embedding")))
          val qLive = db.table("e").filter(col("vec_id") < 32)
          !db.annIndexFresh("e") &&
            db.annTopK("e", qLive, k = 5, nprobe = 6)
              .filter(col("query_id") === 0L &&
                col("neighbor_id") === 1000000L).count() == 1L
        }
      // a row REWRITE diverges the stored lists: serving must refuse
      // (qDel planned AFTER the delete — db.table plans from the
      // manifest at call time)
      val staleDetected = graft.core.BenchPhases.phase("5_delete_stale") {
        db.deleteWhere("e", col("vec_id") === lit(1000000L))
        val q = db.table("e").filter(col("vec_id") < 32)
        try { db.annTopK("e", q, k = 5, nprobe = 6); false }
        catch { case _: IllegalStateException => true }
      }
      val qDel = db.table("e").filter(col("vec_id") < 32)
      val (rebuilt, servesAfterRebuild) =
        graft.core.BenchPhases.phase("6_rebuild_serve") {
          (db.buildAnnIndexIfStale("e"),
            db.annTopK("e", qDel, k = 5, nprobe = 6).count() >= nQ)
        }
      emb.filter(col("vec_id") < 32)
        .agg(count(lit(1)).as("n_queries"))
        .select(col("n_queries"), lit(5).as("k"),
          lit(recallOk).as("recall_ok"),
          lit(survivesCompact).as("survives_compact"),
          lit(servesThroughInsert).as("serves_through_insert"),
          lit(staleDetected).as("stale_detected"),
          lit(rebuilt).as("rebuilt"),
          lit(servesAfterRebuild).as("serves_after_rebuild"))
    } finally db.close()
  }

  /** D44b: the index SERVES THROUGH INSERTS, hash-exact (VERDICT r19
    * #1's "done" gate) — build on HALF the corpus, insert the other
    * half, then [[graft.core.ChronoDB.annTopK]] with NO rebuild: the
    * stored cells answer the indexed rows and an exact cosine scan of
    * exactly the post-build files answers the rest. Probes are
    * EXHAUSTIVE (nprobe = nlist), so the union is EXACTLY brute-force
    * top-k over the FULL live table — hash-checked against the same
    * DuckDB oracle as d3, independent of the fitted centroid values.
    * The builder REQUIRES genuine insert-staleness before the serve
    * and again after (no hidden rebuild); rows collect eagerly
    * (bounded: queries × k) so the hashed result is the delta-serve's,
    * not a post-close replan. */
  def annDeltaServeQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB}
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("d44b_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0))
    try {
      val emb = t(spark, dir, "embeddings")
      val withTs = emb.select(col("vec_id"),
        to_timestamp(lit("2024-01-01 10:00:00")).as("ts"),
        col("embedding"))
      graft.core.BenchPhases.setup {
        db.createTable("e", StructType(Seq(
          StructField("vec_id", LongType),
          StructField("ts", TimestampType),
          StructField("embedding", ArrayType(FloatType)))))
        db.insertFrame("e", withTs.filter(col("vec_id") % 2 === 0))
        db.buildAnnIndex("e", "vec_id", "embedding", nlist = 16,
          seed = 42L)
        db.insertFrame("e", withTs.filter(col("vec_id") % 2 === 1))
      }
      require(!db.annIndexFresh("e"),
        "d44b expects insert-only staleness before the serve")
      val served = db.annTopK("e",
          db.table("e").filter(col("vec_id") < 8), k = 5, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))
        .collect().toIndexedSeq
      require(!db.annIndexFresh("e"),
        "d44b served through a hidden rebuild — the gate is void")
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(served).asJava),
        StructType(Seq(
          StructField("query_id", LongType),
          StructField("rank", IntegerType),
          StructField("neighbor_id", LongType),
          StructField("cos", DoubleType))))
    } finally db.close()
  }

  /** D45: SemDeDup from the STORED index — the d33e/d33g refit gap
    * closed: [[graft.core.ChronoDB.semanticDedupStored]] runs the
    * greedy within-cell drop directly over the `_ann_cells` inverted
    * lists, skipping BOTH the per-query k-means fit and the assignment
    * scan (at 100 TB each is a full corpus pass). Verdicts, all eager:
    *   - stored_matches_centroids: every stored cell EQUALS the cell
    *     re-derived from `_ann`'s centroids by the build's own shared
    *     assignment expression (exact — same floats, same ties), so
    *     the lists are provably not stale or corrupt;
    *   - dupfree_ok: no surviving same-cell pair at cosine ≥ t (the
    *     d33e invariant, on the stored clustering);
    *   - keepers_ok: the d33e keeper bound.
    * The SQL-exact corpus count anchors the hash. */
  def semanticDedupStoredQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB}
    import org.apache.spark.sql.types._
    val cos = NativeExpressions.cosineNative _
    val root = java.nio.file.Files.createTempDirectory("d45_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0))
    try {
      val emb = t(spark, dir, "embeddings")
      graft.core.BenchPhases.setup {
        db.createTable("e", StructType(Seq(
          StructField("vec_id", LongType),
          StructField("ts", TimestampType),
          StructField("embedding", ArrayType(FloatType)))))
        db.insertFrame("e", emb.select(col("vec_id"),
          to_timestamp(lit("2024-01-01 10:00:00")).as("ts"),
          col("embedding")))
        db.buildAnnIndex("e", "vec_id", "embedding", nlist = 16,
          seed = 42L)
      }
      val kept = db.semanticDedupStored("e", threshold = 0.35)
        .select(col("vec_id"), col("cell"))
      val (nKeepers, nVecs) = graft.core.BenchPhases.phase("1_dedup_stored") {
        (kept.count(), db.table("e").count())
      }
      // integrity: stored (id, cell) ≡ re-derived from `_ann` alone
      val matches = graft.core.BenchPhases.phase("2_integrity") {
        val stored = db.annStoredAssignments("e")
        val derived = db.annAssignFromStored("e")
        stored.join(derived, Seq("id", "cell"), "left_anti").count() == 0 &&
          derived.join(stored, Seq("id", "cell"), "left_anti").count() == 0
      }
      // dup-free survivors (the d33e invariant over the stored cells)
      val nViol = graft.core.BenchPhases.phase("3_dupfree") {
        val kv = kept.join(db.table("e")
          .select(col("vec_id"), col("embedding")), Seq("vec_id"))
        kv.as("a")
          .join(kv.as("b"), col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
          .filter(cos(col("a.embedding"), col("b.embedding")) >= 0.35)
          .count()
      }
      emb.agg(count(lit(1)).as("n_vecs"))
        .select(col("n_vecs"), lit(16).as("nlist"),
          lit(nKeepers >= 1 && nKeepers <= nVecs).as("keepers_ok"),
          lit(nViol == 0).as("dupfree_ok"),
          lit(matches).as("stored_matches_centroids"))
    } finally db.close()
  }

  /** D3f: int8 scalar-quantized two-stage ANN — codes (1/4 the scan
    * bytes) rank candidates by exact integer dot, float cosine rescores
    * only the survivors. The ENTIRE pipeline is oracle-replicated:
    * quantization is fixed-order IEEE normalize+floor+clamp, candidate
    * ranking is pure int64, the rescore is the shared bit-identical
    * cosine. */
  def similarityQuantized(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, candidates = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  /** D3g: the composed IVF × int8 production recipe — seeded-quantizer
    * IVF prunes to the probed cells, int8 codes rank candidates inside
    * them by exact integer dot, float cosine rescores the survivors.
    * Every stage is bit-exact cross-engine, so the oracle replicates
    * the ENTIRE composition (d3c's cells + d3f's codes) verbatim. */
  def similarityIvfQuantized(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfQuantizedTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6,
        candidates = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  /** D3h: product-quantization ANN (Jégou et al. 2011) — m=8 subspaces
    * × 16 sampled centroids over the 64-dim embeddings, asymmetric-
    * distance candidate ranking, float-cosine rescore of the 16
    * survivors. Exactly oracle-checked end-to-end: codebook sampling,
    * per-subspace argmin encoding (ordered double folds, ties → smaller
    * cell), the ordered ADC sum, and the shared bit-identical cosine
    * all replicate in DuckDB — see Similarity.pqTopK for the scale
    * story (m bytes/row corpus scan; the float corpus never shuffles). */
  def similarityPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, m = 8, subDim = 8, ks = 16,
        candidates = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  /** D3b: LSH-bucketed approximate ANN (scale path). Exactly
    * oracle-checked even though it is approximate: the plane matrix is a
    * deterministic constant embedded in the oracle SQL (planesLiteral),
    * so DuckDB reproduces the same candidate buckets, cosines, and
    * ranking — recall vs exact is additionally asserted in
    * SimilaritySpec. */
  def similarityLsh(spark: SparkSession, dir: String): DataFrame =
    // 16 bands x 4 bits: measured recall@5 = 0.90 on the fixture
    // embeddings (near-uniform vectors — the hard case for LSH). Larger
    // corpora with real cluster structure should raise bitsPerBand to
    // keep bucket sizes bounded.
    Similarity.lshTopK(t(spark, dir, "embeddings"), "vec_id", "embedding",
        k = 5, bands = 16, bitsPerBand = 4)
      .orderBy(col("query_id"), col("rank"))

  /** D2d: embedding-cosine near-dup pairs (LSH candidates + threshold);
    * oracle replicates the LSH bucketing exactly (see planesLiteral) —
    * including the top-20-per-query truncation before the threshold. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    // fixture vectors are near-uniform (max pairwise cos ≈ 0.48); 0.4
    // marks the "near-dup" tail there — a real corpus would use 0.95+
    Dedup.embeddingNearDup(t(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, bands = 16, bitsPerBand = 4)
      .orderBy(col("id_a"), col("id_b"))

  /** D2e: the full near-dup dedup pipeline — MinHash-LSH pairs →
    * connected components → keeper selection. Oracle: brute-force pairs
    * (see d2 recall argument) + recursive-CTE min-label reachability. */
  def dedupPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    Dedup.dedupByClusters(docs, "doc_id", pairs)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** D36: quality-aware dedup — the d2e pipeline with the keeper rule a
    * production pipeline actually uses: within each near-dup cluster
    * keep the HIGHEST [[Curation.hashedQualityScore]] member (ties →
    * lowest id), not the lowest id. Output carries the score so the
    * oracle pins both the cluster structure and the argmax selection. */
  def qualityDedupQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    Dedup.dedupByClustersBest(docs, "doc_id", pairs,
        Curation.hashedQualityScore(col("text")))
      .select(col("doc_id"),
        Curation.hashedQualityScore(col("text")).as("q_score"))
      .orderBy(col("doc_id"))
  }

  /** D16: cross-source duplication audit — how much each source pair
    * duplicates each other, the diagnostic a corpus-mixing decision
    * reads before weighting sources (inter-source near-dups inflate a
    * source's effective epoch count). Composes the d2 pair generation
    * with source labels: pairs carry only ids, so the joins back to the
    * (doc_id → source) projection are key-only lookups; the aggregate
    * is one tiny (source_a, source_b) group-by. Sum of jaccard goes
    * through Det (decimal-exact, order-independent). */
  def crossSourceDupQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.minHashLsh(docs, "doc_id", "text",
        shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("source_a")),
        Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("source_b")),
        Seq("id_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.core.Det.dsum(col("jaccard")).as("sum_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** D17: Count-Min heavy hitters — corpus token frequencies estimated
    * from a depth×width counter sketch, reported against the exact
    * counts for the top-20 tokens with the CM upper-bound guarantee as
    * an output column (always true: counters only absorb OTHER keys'
    * mass). Unlike HLL (engine-specific registers → q22 is
    * self-validating instead), the CM counter table is portable hash
    * arithmetic, so the WHOLE sketch — build, probe, min — is
    * replicated in the oracle. At scale the sketch answers frequency
    * probes from kilobytes of mergeable state instead of a corpus
    * rescan (see [[Sketches.cmsBuild]]). */
  def cmsHeavyHittersQ(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
    val sketch = Sketches.cmsBuild(toks, "term", depth = 4, width = 64)
    Sketches.cmsEstimate(sketch, exact.select(col("term")), "term",
        depth = 4, width = 64)
      .join(exact, Seq("term"))
      .select(col("term"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt")).as("is_upper_bound"))
      .orderBy(col("exact_cnt").desc, col("term"))
      .limit(20)
  }

  /** D4g: fuzzy matching — Levenshtein distance and a normalized
    * rational similarity over consecutive-doc "title" prefixes (the
    * record-linkage verify primitive; at scale it runs only on
    * LSH/blocking candidates, exactly like the d2 Jaccard verify, so
    * the consecutive-pair declaration mirrors d2c's). Both engines
    * implement unit-cost Levenshtein identically; the similarity is
    * integer-ratio arithmetic (hash-portable). */
  def fuzzyMatchQ(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("title"))
    val a = d.select(col("doc_id").as("id_a"), col("title").as("t_a"))
    val b = d.select((col("doc_id") - 1).as("id_a"),
      col("doc_id").as("id_b"), col("title").as("t_b"))
    a.join(b, Seq("id_a"))
      .withColumn("edit_dist", levenshtein(col("t_a"), col("t_b")))
      .withColumn("sim",
        lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("t_a")), length(col("t_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), col("edit_dist"), col("sim"))
      .orderBy(col("id_a"))
  }

  /** D18: exact equi-depth histogram of event values — optimizer-grade
    * column stats (the selectivity summary per-tablet min/max cannot
    * answer). Declared over INTEGER-SCALED values (cents): Spark's
    * `percentile` and DuckDB's `quantile_cont` use different (equal in
    * ℝ, 1-ulp-different in FP) interpolation formula orders, which over
    * raw doubles flipped a boundary-adjacent row at sf0.001; over
    * integers with dyadic fractions every intermediate product is
    * FP-exact, so both formula orders give the bit-identical boundary.
    * See [[Stats.equiDepthHistogram]] for the no-global-window shape. */
  def equiDepthQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.equiDepthHistogram(
        t(spark, dir, "events")
          .withColumn("value_cents", round(col("value") * 100).cast("long")),
        "value_cents", nBuckets = 8)
      .orderBy(col("bucket"))

  /** D18b: per-event-type equi-depth histograms — the grouped form a
    * warehouse stores as per-key column statistics. Integer-scaled for
    * the same FP-exactness reason as d18. */
  def equiDepthByQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.equiDepthHistogramBy(
        t(spark, dir, "events")
          .withColumn("value_cents", round(col("value") * 100).cast("long")),
        "event_type", "value_cents", nBuckets = 4)
      .orderBy(col("event_type"), col("bucket"))

  /** D26: rolling z-score anomaly detection — per event type, flag
    * events whose value sits more than 3 sample standard deviations
    * from the trailing-20-event baseline (the row itself excluded).
    * The z-test is exact integer arithmetic (see
    * [[graft.operators.Stats.rollingAnomalies]]) so the flagged set is
    * bit-reproducible by the SQL oracle — no stddev doubles, no sqrt. */
  def anomalyQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.rollingAnomalies(
        t(spark, dir, "events")
          .select(col("event_type"), col("event_id"), col("ts"), col("value")),
        "event_type", "ts", "value",
        lookback = 20, zThreshold = 3, tieBreak = Seq("event_id"))
      .orderBy(col("event_id"))

  /** D4: text statistics — token/char/punct/stopword measures. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(txt).as("n_tokens"),
        TextFunctions.charCount(txt).as("n_chars2"),
        TextFunctions.stopwordCount(txt).as("n_stop"),
        round(TextFunctions.stopwordRatio(txt), 6).as("stop_ratio"),
        round(TextFunctions.meanTokenLen(txt), 6).as("mean_tok_len"))
      .orderBy(col("doc_id"))
  }

  /** D4b: language ID + quality score + BPE-ish token count — all
    * deterministic column math, hash-checked against a DuckDB oracle
    * replicating the same heuristics. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextFunctions.langId(txt).as("lang_guess"),
        TextFunctions.qualityScore(txt).as("quality"),
        TextFunctions.approxBpeTokenCount(txt).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** D4d: repetition stats (Gopher-style quality rule) — per-document
    * top-bigram fraction: a high max-bigram share marks boilerplate /
    * degenerate repetition. Exact cross-engine: counts are ints, the
    * fraction is one IEEE division. Docs with <2 tokens have no bigrams
    * and drop out (both engines agree). */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val toks = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bigrams = toks.select(col("doc_id"), explode(
      zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        max(col("c")).as("max_bg"),
        (max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_frac"))
      .orderBy(col("doc_id"))
  }

  /** D4f: PII redaction (emails / IPv4 / long digit runs). The fixture
    * text contains no PII, so the query synthesizes a deterministic
    * PII-bearing suffix from (doc_id, source) — both engines build the
    * identical string, then apply the identical RE2-safe patterns, so
    * the redacted output and match counts hash-match exactly. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val synth = concat(
      substring(col("text"), 1, 40),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@"), col("source"), lit(".org"),
      lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
      lit(".7 card 4111111111111111"))
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextFunctions.emailCount(synth).as("n_email"),
        TextFunctions.redactPii(synth).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** D10: two-phase salted aggregation (Skew.saltedGroupBy) declared as
    * a query — event_type is exactly the hot-key shape (5 values over
    * the whole table). Hash-checkable against a PLAIN GROUP BY because
    * the salt only changes physical distribution: counts are integers
    * and the sum is decimal-exact, so partial-then-merge equals the
    * one-shot aggregate bit for bit (a double sum would NOT be salt-
    * invariant — addition order changes with the salt). */
  def saltedAggQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = col("value").cast(DecimalType(25, 10))
    graft.operators.Skew.saltedGroupBy(
        t(spark, dir, "events"), Seq("event_type"),
        Seq(graft.operators.Skew.count_("n"),
          graft.operators.Skew.SaltedAgg(sum(dec), "sv", "sum")),
        saltBuckets = 16)
      .select(col("event_type"), col("n"),
        graft.core.Det.dec2dbl(col("sv")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** D24: salted skew join (Skew.saltedJoin) declared as a query —
    * events (the skewable fact side) joined to customer attributes,
    * rolled up per market segment. Hash-checkable against a PLAIN
    * inner join + GROUP BY because the salt only changes physical
    * distribution: the join result is set-identical (inner, key
    * equality), counts are integers, and the sum is decimal-exact, so
    * the rollup is salt-invariant bit for bit (d10's argument). */
  def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val big = t(spark, dir, "events")
      .select(col("user_id").as("c_custkey"),
        col("value").cast(DecimalType(25, 10)).as("v"))
    val small = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(big, small, "c_custkey", saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("c_mktsegment"), col("n"),
        graft.core.Det.dec2dbl(col("sv")).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** D5b: multimodal feature extraction — documents stand in for media
    * payloads; the stub encoder's pseudo-embedding is deterministic, so
    * the whole binary→vector path (schema, partition-parallel decode,
    * ArrayType(FloatType) output) is hash-checked end to end. The
    * declared output is posexploded to scalar cells (media_id, dim,
    * value) because the driver's hash compare cannot lexsort array
    * cells; the library API ([[Multimodal.extractFeatures]]) keeps the
    * ArrayType(FloatType) shape the Similarity/Dedup operators consume.
    * Note: posexplode drops rows with null/empty embeddings, so
    * row-count parity with the oracle's fixed 16-rows-per-doc output
    * relies on extractFeatures always emitting a non-empty fixed-dim
    * array — a regression there fails the rows_match check rather than
    * being masked. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(
      t(spark, dir, "documents"), "doc_id", "text", "text/plain")
    Multimodal.extractFeatures(spark, media, dim = 16)
      .select(col("media_id"), posexplode(col("embedding")).as(Seq("dim", "value")))
      .orderBy(col("media_id"), col("dim"))
  }

  /** D4e: corpus-wide top-20 trigrams through the native n-gram
    * Generator (the UDTF leg of the custom-function surface; scalar =
    * native expressions, aggregate = TopKByScoreAgg). Fully tie-broken
    * (count desc, ngram) so the LIMIT is deterministic cross-engine. */
  def ngramTopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(NativeExpressions.ngramsExplode(col("text"), 3))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(20)

  /** D4c: rolling document fingerprint — portable polynomial hash chain
    * (mod 2^31-1), hash-checked against a DuckDB list_reduce oracle. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** D5: multimodal metadata — binary payload byte length + fake-decoded
    * dimensions (see Multimodal stub). Oracle covers the byte-length
    * (real) part. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(
      t(spark, dir, "documents"), "doc_id", "text", "text/plain")
    media.select(
        col("media_id"),
        col("media_type"),
        octet_length(col("payload")).as("byte_len"))
      .orderBy(col("media_id"))
  }

  /** D5c: the decode stage itself, hash-checked — media_id plus the
    * full typed metadata struct (byte_len, width, height, n_frames)
    * from the partition-parallel mapPartitions decode; the oracle
    * replicates FakeDecoder's signed-64 rolling hash in HUGEINT the
    * same way d5b does. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(
      t(spark, dir, "documents"), "doc_id", "text", "text/plain")
    Multimodal.decodeMeta(spark, media)
      .select(col("media_id"), col("media_type"),
        col("meta.byte_len").as("byte_len"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"))
      .orderBy(col("media_id"))
  }

  /** D5d: video-style frame sampling — every 2nd frame index of each
    * decoded media row (explode of a bounded sequence, partition-local;
    * the oracle recomputes n_frames via the d5c HUGEINT emulation and
    * replays the same strided series). */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(
      t(spark, dir, "documents"), "doc_id", "text", "text/plain")
    Multimodal.sampleFrames(Multimodal.decodeMeta(spark, media), stride = 2)
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** D5e: resize stage — the payload→payload transform shape; the stub
    * truncates proportionally to the area ratio, so output byte lengths
    * are deterministic. Declared output carries the LENGTH of the
    * resized payload (plus the new dims), keeping the hash compare on
    * scalar columns. All arithmetic is a chain of exact int→double
    * products and correctly-rounded divisions, truncated — replicated
    * with floor() in the oracle (DuckDB CAST(double AS INT) rounds,
    * Scala .toInt truncates). */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(
      t(spark, dir, "documents"), "doc_id", "text", "text/plain")
    Multimodal.resize(spark, media, w = 64, h = 64)
      .select(col("media_id"), col("media_type"),
        octet_length(col("payload")).as("new_byte_len"),
        col("width"), col("height"))
      .orderBy(col("media_id"))
  }

  /** D5f: the REAL image codec round-trip ([[Multimodal.ImageCodec]],
    * r13 VERDICT #6) — every document id renders a deterministic 32×32
    * RGB pattern, encodes through the real `javax.imageio` PNG writer,
    * then [[Multimodal.imageHashes]] decodes with the real reader and
    * computes exact integer aHash/dHash perceptual fingerprints from
    * the decoded pixels. PNG is lossless, so the DuckDB oracle
    * recomputes the identical hashes straight from the generator
    * formula (integer luma, 4×4 block average, HUGEINT bit-sum with
    * the d5b signed-64 wrap) — a hash match proves the real
    * encode→decode→pixel path is bit-exact, not stubbed. */
  def imageHashQ(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthImages(
      t(spark, dir, "documents"), "doc_id", w = 32, h = 32)
    Multimodal.imageHashes(media).orderBy(col("media_id"))
  }

  /** D5j: REAL image resize ([[Multimodal.resizeImages]]) — the d5f
    * PNGs (32×32, generator-formula pixels) downscaled to 16×16 through
    * real decode → exact nearest-neighbor kernel → real PNG re-encode,
    * then fingerprinted by the SAME real decode+hash path d5f gates.
    * The kernel's pixel mapping is spec-defined (src = dst·2 at this
    * ratio), so the oracle recomputes the RESIZED image's luma grid and
    * hashes from the generator formula at (2x, 2y) — the full resize
    * pipeline (both codecs + kernel) lands inside one pixel-exact hash
    * gate, retiring d5e's payload-opaque stub as the only resize
    * story. */
  def resizeRealQ(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthImages(
      t(spark, dir, "documents"), "doc_id", w = 32, h = 32)
    Multimodal.imageHashes(
        Multimodal.resizeImages(media, w = 16, h = 16))
      .orderBy(col("media_id"))
  }

  /** D5g: the LOSSY codec path ([[Multimodal.jpegRoundTrip]]) — each
    * d5f PNG is JPEG-encoded at q=0.85 through the real `javax.imageio`
    * writer, decoded back, and compared cell-exactly against the
    * lossless original. The declared output is dims + five verdicts
    * (dims survive, encode bytewise-deterministic, max per-cell luma
    * error ≤ 8, aHash/dHash hamming ≤ 6); measured headroom on this
    * corpus is max err 4 / hamming 3, so the bounds are tight enough
    * to catch a broken codec and loose enough to survive a different
    * JDK encoder. DuckDB can't decode JPEG, so the oracle asserts the
    * verdicts (the d3e self-validation pattern) — lossy bytes are
    * codec facts, not engine facts. */
  def jpegRoundTripQ(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthImages(
      t(spark, dir, "documents"), "doc_id", w = 32, h = 32)
    Multimodal.jpegRoundTrip(media, quality = 0.85f, cellErrTol = 8,
      hamTol = 6).orderBy(col("media_id"))
  }

  /** D5h: the REAL audio codec round-trip ([[Multimodal.AudioCodec]]) —
    * every document id renders a deterministic 2000-sample mono 16-bit
    * PCM signal, packs it through the real `javax.sound.sampled` WAV
    * writer, then [[Multimodal.audioFeatures]] parses the RIFF
    * container with the real reader and computes exact integer signal
    * features (duration, peak, zero crossings, energy) from the
    * decoded samples. PCM-in-WAV is lossless, so the DuckDB oracle
    * recomputes the identical features straight from the sample
    * formula without touching the container — a match proves the real
    * encode→parse→sample path is bit-exact: the d5f pattern with the
    * raster codec swapped for the audio one. */
  def audioFeaturesQ(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthAudio(
      t(spark, dir, "documents"), "doc_id",
      sampleRate = 8000, nSamples = 2000)
    Multimodal.audioFeatures(media).orderBy(col("media_id"))
  }

  /** D5i: the REAL video CONTAINER parse ([[Multimodal.VideoContainer]])
    * — every document id writes a minimal valid ISO-BMFF (MP4) file per
    * ISO/IEC 14496-12 (ftyp + moov(mvhd + trak(tkhd)) + mdat, computed
    * big-endian sizes), then [[Multimodal.videoMeta]] walks the box
    * tree back with the general parser (largesize-aware, container
    * recursion, unknown boxes skipped) and extracts
    * timescale/duration/track geometry/mdat payload size. The varying
    * fields are small-integer formulas of the id, so the DuckDB oracle
    * recomputes every parsed value without touching bytes — a match
    * proves the write→walk→extract path implements the spec's byte
    * layout exactly. The CODEC layer stays a documented stub (no video
    * codec in the JDK); this is the no-decode metadata pass every
    * video pipeline runs before deciding what to decode. */
  def videoMetaQ(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthVideos(t(spark, dir, "documents"), "doc_id")
    Multimodal.videoMeta(media).orderBy(col("media_id"))
  }

  /** D6: deterministic uniform hash sample (~30% of documents) — the
    * reproducible, resumable form of corpus subsampling. */
  def hashSampleQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(Curation.hashSample(col("doc_id"), 0.30))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** D6b: stratified sample — exactly 5 docs per source, md5-ordered. */
  def stratifiedSampleQ(spark: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(t(spark, dir, "documents"),
        "source", "doc_id", perGroup = 5)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))

  /** D7: sequence packing — documents assigned to 2048-token training
    * bins by cumulative offset within each language. */
  def tokenPackingQ(spark: SparkSession, dir: String): DataFrame =
    Curation.packByTokenBudget(t(spark, dir, "documents"),
        "lang", "doc_id", "text", budget = 2048L)
      .orderBy(col("lang"), col("doc_id"))

  /** D9: benchmark decontamination — corpus docs (doc_id ≥ 25) sharing
    * ≥ 3 distinct 5-shingles with the "benchmark" (doc_id < 25). */
  def contaminationQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Curation.contaminationByShingle(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", k = 5, minOverlap = 3L)
      .orderBy(col("doc_id"))
  }

  /** D9b: the same decontamination through the Bloom pre-filter path
    * (Curation.contaminationBloom). Bloom containment (no false
    * negatives) + the exact semi-join behind it make the result
    * identical to d9, so the exact SQL is a true oracle for this plan
    * — a hash-match proves the pre-filter dropped no real overlap. */
  def contaminationBloomQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Curation.contaminationBloom(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", k = 5, minOverlap = 3L)
      .orderBy(col("doc_id"))
  }

  /** D19: PERSISTED per-bucket sketch statistics, driven end-to-end
    * through the ChronoDB lifecycle: events land in a day-bucketed
    * table (each insert writes an HLL key sketch per bucket into the
    * `_stats` sidecar), then weekly distinct-user counts are answered
    * by MERGING sidecar sketches — zero data rescans. Self-validating
    * (q22 pattern): the exact weekly distincts are computed in-query
    * alongside and the verdict must come out TRUE per week; HLL at
    * lgK=12 is ~1.6% rel. error and the weekly cardinalities here are
    * ≤ 2048, so the 5%+2 margin cannot flip. The oracle recomputes the
    * exact anchors in SQL. */
  def bucketSketchDistinctQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d19_db").toString
    // CMS sidecar off: this query exercises the HLL path (d19b owns CMS)
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchCmsDepth = 0))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      val weekly = db.sketchStats("ev")
        .groupBy(to_date(date_trunc("week", to_date(col("bucket"))))
          .as("week_start"))
        .agg(hll_sketch_estimate(
          hll_union_agg(col("sketch"), lit(false))).as("est"))
      val exact = ev
        .groupBy(to_date(date_trunc("week", col("ts"))).as("week_start"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(weekly, Seq("week_start"))
        .select(col("week_start"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(col("n_exact") * 0.05, lit(2.0))).as("within_tol"))
        .orderBy(col("week_start"))
    } finally db.close()
  }

  /** D19b: the CMS sidecar end-to-end — per-bucket Count-Min counter
    * tables persisted at insert, merged by addition over the full
    * range, probed for the first 20 users. Unlike d19's HLL registers
    * the counters use the portable polynomial hash pair, so the oracle
    * replicates the ENTIRE sketch (build, merge, probe) and the
    * estimate values themselves hash-match — plus the upper-bound
    * property as an output column, like d17. */
  def bucketCmsKeyCountQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d19b_db").toString
    // HLL sidecar off: this query exercises the CMS path (d19 owns HLL)
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 4, sketchCmsWidth = 1024))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      val lo = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      val probes = ev.filter(col("user_id") < 20)
        .select(col("user_id").cast("string").as("key")).distinct()
      val est = db.approxKeyCounts("ev", lo, hi, probes, "key")
      val exact = ev.filter(col("user_id") < 20)
        .groupBy(col("user_id").cast("string").as("key"))
        .agg(count(lit(1)).as("n_exact"))
      exact.join(est, Seq("key"))
        .select(col("key"), col("n_exact"), col("cms_est"),
          (col("cms_est") >= col("n_exact")).as("is_upper_bound"))
        .orderBy(col("key"))
    } finally db.close()
  }

  /** D20: the `_colstats` histogram sidecar end-to-end — events land in
    * a day-bucketed ChronoDB table, rebuildColStats persists one
    * 16-cell equi-depth ts histogram per bucket, and range-cardinality
    * ESTIMATES are then answered from those kilobytes alone (the
    * optimizer loop rangeJoinAdaptive consumes). Self-validating (d19
    * pattern — interpolated boundaries at epoch-µs magnitude cannot be
    * replicated bit-exactly cross-engine, so raw estimates stay out of
    * the hashed output): per probe range the query emits the EXACT row
    * count (oracle-hash-matched) plus two verdicts the oracle requires
    * TRUE —
    *  (a) `aligned_exact`: for bucket-ALIGNED ranges every histogram
    *      cell is fully contained, so the estimate must equal the
    *      exact count EXACTLY (integer-valued doubles sum exactly in
    *      any order — no tolerance needed);
    *  (b) `bound_ok`: for unaligned ranges the estimate's error is
    *      bounded by the total `n` of the straddling cells — the
    *      classic equi-depth guarantee (ChronoDBSpec asserts the same
    *      bound on fixtures; this promotes it to the driver gate on
    *      real data).
    */
  def colStatsEstimateQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d20_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      db.rebuildColStats("ev", nHist = 16)
      val probes = Seq(
        (1L, "2024-01-05 00:00:00", "2024-01-11 23:59:59.999999", true),
        (2L, "2024-01-01 00:00:00", "2024-01-31 23:59:59.999999", true),
        (3L, "2024-01-03 07:20:00", "2024-01-17 18:40:00", false),
        (4L, "2024-01-10 12:34:56.789012", "2024-01-12 01:23:45.678901", false))
        .toDF("range_id", "s", "e", "aligned")
        .select(col("range_id"), col("aligned"),
          unix_micros(to_timestamp(col("s"))).as("qlo"),
          unix_micros(to_timestamp(col("e"))).as("qhi"))
      // estimate + straddle mass straight from the persisted sidecar —
      // same interpolation as ChronoDB.estimateRowsInRange, columnar
      // over all probes at once; the sidecar is KBs, the probe table is
      // 4 rows, so the whole estimation stage never touches data files
      val est = db.colStats("ev").crossJoin(broadcast(probes))
        .withColumn("contrib",
          when(col("hi") < col("qlo") || col("lo") > col("qhi"), lit(0.0))
            .when(col("lo") >= col("qlo") && col("hi") <= col("qhi"),
              col("n").cast("double"))
            .otherwise(col("n").cast("double") *
              (least(col("hi"), col("qhi")) - greatest(col("lo"), col("qlo")))
                .cast("double") /
              greatest(col("hi") - col("lo"), lit(1L)).cast("double")))
        .withColumn("straddle",
          when(col("hi") < col("qlo") || col("lo") > col("qhi") ||
            (col("lo") >= col("qlo") && col("hi") <= col("qhi")), lit(0L))
            .otherwise(col("n")))
        .groupBy(col("range_id"), col("aligned"))
        .agg(sum(col("contrib")).as("est"), sum(col("straddle")).as("slack"))
      val exact = ev.crossJoin(broadcast(probes.select(col("range_id"),
          col("qlo"), col("qhi"))))
        .filter(unix_micros(col("ts")).between(col("qlo"), col("qhi")))
        .groupBy(col("range_id")).agg(count(lit(1)).as("n_exact"))
      est.join(exact, Seq("range_id"))
        .select(col("range_id"), col("n_exact"),
          (!col("aligned") || col("est") === col("n_exact").cast("double"))
            .as("aligned_exact"),
          (abs(col("est") - col("n_exact").cast("double")) <=
            col("slack").cast("double")).as("bound_ok"))
        .orderBy(col("range_id"))
    } finally db.close()
  }

  /** D21: Bloom-index point lookup — the ChronoDB `_stats` sidecar's
    * per-bucket (key_min, key_max, Bloom) family driving FILE-level
    * bucket pruning for key lookups, end-to-end on real data. The
    * Spark-native re-expression of the reference's per-tablet key index
    * (index.go:23-60 persists per-block lastKeys; findBlockForKey,
    * index.go:231-238, binary-searches them): events land in ~720
    * hour buckets, each probe user occurs in well under 100 of them, so
    * `queryKey` must read strictly fewer files than the table holds.
    *
    * Gate semantics (d19/d20 pattern): the LOOKUP RESULT itself (key,
    * ts, event_type per probe) is hash-exact against DuckDB — the
    * sidecar path must return precisely the rows a full scan would —
    * and the pruning claim rides along as an in-query verdict
    * (`prune_ok`: every probe's executed scan touched < total files;
    * Bloom false positives can only ADD buckets, never drop rows, so
    * the verdict is stable and the result exact). Probes are the min
    * and max user_id — data-derived, so the same query text works at
    * every SF. */
  def keyLookupQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d21_db").toString
    // bloom family only (lgK/CMS off): the index under test, hour
    // buckets for a prunable bucket count, one writer per bucket so the
    // file count stays at one per (bucket, batch)
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "hour",
      sketchLgK = 0, sketchCmsDepth = 0, writersPerBucket = 1))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      val mm = ev.agg(min(col("user_id")), max(col("user_id"))).head()
      val probes = Seq(mm.getLong(0).toString, mm.getLong(1).toString)
      val total = db.stats("ev").numFiles
      val pruneOk = probes.forall { k =>
        val q = db.queryKey("ev", k)
        q.collect()
        val scanned = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.map(_.metrics("numFiles").value).sum
        scanned > 0 && scanned < total
      }
      probes.map(k => db.queryKey("ev", k)).reduce(_ union _)
        .select(col("key"), col("ts"),
          decode(col("data"), "UTF-8").as("event_type"))
        .withColumn("prune_ok", lit(pruneOk))
        .orderBy(col("key"), col("ts"), col("event_type"))
    } finally db.close()
  }

  /** D21b: key-RANGE scan through the sidecar min/max interval — the
    * prefix-scan access pattern gate-checked on real data. Events are
    * keyed `d<DD>/u<user>` (day-prefixed, so each hour bucket's key
    * interval spans exactly its own day's prefix), and the scan asks
    * for one day's prefix range: queryKeyRange must prune to that
    * day's ~24 hourly buckets out of ~720 (prune_ok verdict) and
    * return exactly the day's rows (hash vs the plain BETWEEN oracle).
    * The Bloom family cannot serve ranges — this is the key_min/key_max
    * half of the index earning its keep. */
  def keyRangeScanQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d21b_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "hour",
      sketchLgK = 0, sketchCmsDepth = 0, writersPerBucket = 1))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(
        concat(lit("d"), date_format(col("ts"), "dd"),
          lit("/u"), col("user_id").cast("string")).as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      val total = db.stats("ev").numFiles
      val q = db.queryKeyRange("ev", "d05/", "d05/\uffff")
      q.collect()
      val scanned = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numFiles").value).sum
      val pruneOk = scanned > 0 && scanned < total
      db.queryKeyRange("ev", "d05/", "d05/\uffff")
        .select(col("key"), col("ts"),
          decode(col("data"), "UTF-8").as("event_type"))
        .withColumn("prune_ok", lit(pruneOk))
        .orderBy(col("key"), col("ts"), col("event_type"))
    } finally db.close()
  }

  /** D22: document chunking — fixed 200-char windows with 50-char
    * overlap (stride 150), the pre-embedding/RAG splitter. Pure map +
    * controlled posexplode (see Curation.chunkDocuments); integer-only
    * chunk counts and 1-based substring windows replicate exactly in
    * the oracle's lateral generate_series. */
  def docChunksQ(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkDocuments(t(spark, dir, "documents"), "doc_id", "text",
        chunkChars = 200, overlapChars = 50)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** D11: deterministic corpus shuffle — the seeded global permutation
    * a pretraining run applies before batching; one range-partitioned
    * sort, reproducible across reruns and engines. */
  def corpusShuffleQ(spark: SparkSession, dir: String): DataFrame =
    Curation.shuffleOrder(t(spark, dir, "documents"), "doc_id", seed = 7L)
      .select(col("doc_id"), col("shuffle_key"), col("source"))

  /** D12: deterministic train/val/test split — stable hash-based
    * membership (a doc keeps its split across corpus rebuilds: no
    * silent train/test leakage), pure map, no RNG state. */
  def splitAssignQ(spark: SparkSession, dir: String): DataFrame =
    Curation.assignSplit(t(spark, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L)
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** D8: weighted dataset mixing — src0 oversampled 3×, src1 2×,
    * everything else 1×, each copy tagged with its epoch. */
  def datasetMixQ(spark: SparkSession, dir: String): DataFrame =
    Curation.mixByWeight(t(spark, dir, "documents"),
        "source", Seq("src0" -> 3, "src1" -> 2))
      .select(col("doc_id"), col("source"), col("epoch"))
      .orderBy(col("doc_id"), col("epoch"))

  /** D13: cross-document boilerplate fraction — per doc, the share of
    * its distinct 3-grams appearing in ≥ 2 documents corpus-wide (the
    * MassiveText/C4 duplicate-span signal; intra-doc repetition is d4d).
    * All 500 docs returned so the filter cut stays with the caller. */
  def boilerplateQ(spark: SparkSession, dir: String): DataFrame =
    Curation.boilerplateNgramStats(t(spark, dir, "documents"),
        "doc_id", "text", k = 3, minDocs = 2L)
      .orderBy(col("doc_id"))

  /** D14: TF-IDF top-3 terms per document — keyword extraction with the
    * rational idf N/df (one IEEE division; see Curation.tfIdfTopTerms
    * for why the log form is not hash-portable), ties on the term. */
  def tfidfQ(spark: SparkSession, dir: String): DataFrame =
    Curation.tfIdfTopTerms(t(spark, dir, "documents"),
        "doc_id", "text", topK = 3)
      .withColumnRenamed("rank", "rnk")
      .orderBy(col("doc_id"), col("rnk"))

  /** D23: BM25 retrieval — the corpus ranked against a fixed probe
    * query ("hash join merge stream"), global top-20. Rational idf
    * (2N−2df+1)/(2df+1) instead of the log form (ln is 1-ulp divergent
    * cross-engine; same trade as D14), ordered per-doc term fold, and
    * a TakeOrderedAndProject top-k — see [[Curation.bm25TopK]] for the
    * scale shape. Oracle constants are all ::DOUBLE-cast (DuckDB
    * numeric literals are DECIMAL and would silently switch the whole
    * score into decimal arithmetic). */
  def bm25Q(spark: SparkSession, dir: String): DataFrame =
    Curation.bm25TopK(t(spark, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "merge", "stream"), k = 20)
      .withColumnRenamed("rank", "rnk")
      .orderBy(col("rnk"))

  /** D25: the `_rollup` continuous-aggregate sidecar end-to-end — the
    * TimescaleDB continuous-aggregate idea in sidecar form. Events land
    * in a day-bucketed ChronoDB table whose config maintains per-hour
    * (n, nv, sum, vmin, vmax) of a value expression AT INSERT (the
    * aggregate rides the data-write job via Dataset.observe — zero
    * extra passes), and [[graft.core.ChronoDB.rollupRange]] then
    * answers a 15.5-day per-hour aggregate sweep ENTIRELY from the
    * kilobyte sidecar — no data files touched. Everything is exact
    * BIGINT by contract (integer adds are order-free, so the
    * observe-built rows equal a direct aggregation bit for bit), which
    * is what makes the query fully hash-oracle-able: DuckDB recomputes
    * the same slots from the raw events. The value expression exercises
    * the null path (non-'view' rows only), so `nv < n` and the
    * null-skipping min/max/sum semantics are all pinned. */
  def rollupRangeQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d25_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      rollupValue = Some(
        "case when decode(data, 'utf-8') <> 'view' then key end")))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      db.rollupRange("ev",
          java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-20 12:30:00"))
        .orderBy(col("slot_start"))
    } finally db.close()
  }

  /** D43: SNAPSHOT-CONSISTENT sidecar serving (VERDICT r17 Missing #3)
    * — [[graft.core.ChronoDB.rollupRangeAsOf]]: insert everything
    * (v1), then DELETE the early days (v2 — a post-snapshot mutation
    * that rewrites the live table and its sidecars); the rollup read
    * AS OF v1 must equal the oracle over the ORIGINAL rows. Before
    * this verb existed, a sketch read against a snapshot silently
    * reflected post-snapshot mutations. Buckets untouched by the
    * delete serve from the KB sidecar fold; deleted ones recompute
    * from the snapshot's trash-retained files — O(diverged buckets)
    * data reads. The in-query verdict pins that the live rollup
    * genuinely differs (the as-of read is not just the live one). */
  def rollupAsOfQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d43_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      trashGraceMs = 3600000L,
      rollupValue = Some(
        "case when decode(data, 'utf-8') <> 'view' then key end")))
    try {
      val ev = t(spark, dir, "events")
      // seeding marked SETUP (the convention every other storage gate
      // follows — r20 measurement fix): the operator under measurement
      // is the snapshot-consistent rollup serve, not the fixture insert
      graft.core.BenchPhases.setup {
        db.createTable("ev")
        db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
          col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      }
      val v1 = db.history("ev").head.version
      db.deleteWhere("ev",
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")))
      val lo = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      val hi = java.sql.Timestamp.valueOf("2024-01-20 12:30:00")
      val asOf = db.rollupRangeAsOf("ev", lo, hi, v1).localCheckpoint()
      val differs =
        db.rollupRange("ev", lo, hi).count() != asOf.count()
      asOf.withColumn("snapshot_differs_from_live", lit(differs))
        .orderBy(col("slot_start"))
    } finally db.close()
  }

  /** D46: snapshot-consistent KEY LOOKUP
    * ([[graft.core.ChronoDB.queryKeyAsOf]] — the late-r19 as-of
    * sidecar-serving verb, now a DECLARED hash gate): insert the
    * fixture keyed by user, snapshot v1, DELETE the probe key's early
    * window (diverging part of its bucket family), then read the key
    * AS OF v1 — the result must be the key's PRE-DELETE row set
    * exactly (the oracle is a plain key filter over the fixture),
    * while the live read sees fewer rows (in-query verdict). The
    * `_stats` Bloom/min-max pruning stays active for buckets whose
    * snapshot file set equals their live set; diverged buckets scan
    * their trash-retained snapshot files (TimeTravelSpec pins the
    * 2-of-3-files I/O shape). */
  def keyAsOfQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d46_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      trashGraceMs = 3600000L))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      graft.core.BenchPhases.setup {
        db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
          col("ts"), encode(col("event_type"), "UTF-8").as("data"))
          .as[ChronoRow])
      }
      val probeKey = ev.agg(min(col("user_id"))).head().getLong(0).toString
      val v1 = db.history("ev").head.version
      db.deleteWhere("ev", col("key") === lit(probeKey) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")))
      val asOf = db.queryKeyAsOf("ev", probeKey, v1).localCheckpoint()
      val differs = db.queryKey("ev", probeKey).count() != asOf.count()
      asOf.select(col("key"), col("ts"),
          decode(col("data"), "UTF-8").as("event_type"))
        .withColumn("snapshot_differs_from_live", lit(differs))
        .orderBy(col("ts"), col("event_type"))
    } finally db.close()
  }

  /** D28: hybrid retrieval — BM25 lexical top-50 and dense cosine
    * top-50 (query = vec_id 0's embedding, corpus ids aligned with
    * doc ids) fused by reciprocal rank fusion into one top-20 (see
    * [[Fusion.reciprocalRankFusion]] for the scale and determinism
    * story: the fusion stage consumes kilobyte rank lists whatever the
    * corpus size; each RRF summand is one exact-integer IEEE division
    * and the sum order is fixed, so the fused scores hash-match the
    * oracle bit for bit). */
  def hybridRrfQ(spark: SparkSession, dir: String): DataFrame = {
    val text = Curation.bm25TopK(t(spark, dir, "documents"), "doc_id",
        "text", Seq("hash", "join", "merge", "stream"), k = 50)
      .select(col("doc_id"), col("rank"))
    val emb = t(spark, dir, "embeddings")
    val vec = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    Fusion.reciprocalRankFusion(Seq("text" -> text, "vec" -> vec),
        "doc_id", "rank", kConst = 60, topK = 20)
      .orderBy(col("fused_rank"))
  }

  /** D29: dataset drift report — the length distribution of the
    * even-numbered sources vs the odd-numbered ones over fixed
    * literal bins (the pre-mixing check a pipeline runs before
    * admitting a new crawl; see [[Stats.driftReport]]). Counts are
    * exact, the chi² divergence is an ordered fold of elementary IEEE
    * terms (hash-exact), and the log-based PSI enters only as a
    * thresholded verdict. */
  def driftQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val par = regexp_extract(col("source"), "([0-9]+)$", 1)
      .cast("int") % 2
    Stats.driftReport(
      docs.filter(par === 0), docs.filter(par === 1),
      "n_chars", Seq(100L, 200L, 300L, 400L, 500L))
  }

  /** D25b: the REAL-TIME continuous aggregate — an unaligned µs range
    * answered exactly by [[graft.core.ChronoDB.rollupRangeRealtime]]:
    * interior slots from the `_rollup` sidecar, the two partial edge
    * slots recomputed from bucket-pruned data clipped to the range
    * (the TimescaleDB real-time-aggregate / materialized-view-rewrite
    * shape — the data scan is bounded by two slots regardless of range
    * length). Same exact-BIGINT contract as d25, so the oracle is a
    * plain range-filtered hourly aggregation. */
  def rollupRealtimeQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d25b_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      rollupValue = Some(
        "case when decode(data, 'utf-8') <> 'view' then key end")))
    try {
      db.createTable("ev")
      val ev = t(spark, dir, "events")
      db.insert("ev", ev.select(col("user_id").cast("string").as("key"),
        col("ts"), encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow])
      db.rollupRangeRealtime("ev",
          java.sql.Timestamp.valueOf("2024-01-05 07:42:11.5"),
          java.sql.Timestamp.valueOf("2024-01-20 18:15:00.25"))
        .orderBy(col("slot_start"))
    } finally db.close()
  }

  /** D30: storage-layer upsert — [[graft.core.ChronoDB.upsert]]
    * end-to-end on real data: the first half of the month lands as
    * state, the second half is UPSERTED (every key in the batch has its
    * old rows replaced — bloom-pruned bucket rewrites — and the batch
    * inserted), and the final table content is read back. The oracle is
    * the set-algebra of the contract: untouched keys' old rows + the
    * batch. Complements q51 (the DataFrame MERGE): this is the mutable
    * state TABLE the reference's ignored `PrimaryKeys` option promises
    * (types.go:10-13). */
  def chronoUpsertQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d30_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
    try {
      db.createTable("st")
      val ev = t(spark, dir, "events")
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      def chrono(df: org.apache.spark.sql.DataFrame) =
        df.select(col("user_id").cast("string").as("key"), col("ts"),
          encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow]
      db.insert("st", chrono(ev.filter(col("ts") < split)))
      db.upsert("st", chrono(ev.filter(col("ts") >= split)))
      db.query("st",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
        .select(col("key"), col("ts"),
          decode(col("data"), "UTF-8").as("state"))
        .orderBy(col("key"), col("ts"), col("state"))
    } finally db.close()
  }

  /** D38: shuffle-free fact-fact join on the STORED bucketed layout
    * (ChronoConfig.keyBuckets + [[graft.core.ChronoDB.rebuildBucketed]],
    * r13 VERDICT #7): two chrono tables (January's first and second
    * half) are materialized as key-bucketed twins, then joined and
    * aggregated ON the bucket key. The plan must carry no exchange
    * before the join (PlanGuardSpec pins exactly that); the hash gate
    * here pins the VALUES — the bucketed layout must answer exactly
    * what the plain join answers. */
  def bucketedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("d38_db").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 8))
    try {
      val ev = t(spark, dir, "events")
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      def chrono(df: org.apache.spark.sql.DataFrame) =
        df.select(col("user_id").cast("string").as("key"), col("ts"),
          encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow]
      db.createTable("h1"); db.insert("h1", chrono(ev.filter(col("ts") < split)))
      db.createTable("h2"); db.insert("h2", chrono(ev.filter(col("ts") >= split)))
      db.rebuildBucketed("h1"); db.rebuildBucketed("h2")
      val a = db.bucketedTable("h1")
        .select(col("key"), decode(col("data"), "UTF-8").as("et_a"))
      val b = db.bucketedTable("h2")
        .select(col("key"), decode(col("data"), "UTF-8").as("et_b"))
      a.hint("merge").join(b.hint("merge"), Seq("key"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("et_a") === col("et_b"), 1)).as("n_same"))
        .orderBy(col("key"))
    } finally db.close()
  }

  /** D39: the d38 co-located join WITHOUT the caller naming the twin —
    * [[graft.plans.BucketedTwinRule]] routes the plain `table()` frames
    * to their fresh `_bucketed` twins at plan time (r14 VERDICT Missing
    * #2): the user writes the obvious join, the planner supplies the
    * zero-exchange layout, and a stale twin silently falls back to the
    * plain scan (BucketingSpec pins the fallback). Same values as d38
    * (hash gate); the routing claim is the in-query `auto_routed`
    * verdict — the executed join+agg plan carries ZERO shuffle
    * exchanges, checked BEFORE the presentation orderBy (which
    * legitimately shuffles). */
  def bucketedAutoRouteQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine, PlanMetrics}
    import spark.implicits._
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("d39_db").toString
    // lockMode=verb (r19): the auto_routed verdict below now ALSO
    // certifies shared-writer routing — verb mode serves the twin off
    // the `_bucketed_head` marker vs the history head at plan time
    // (twinPlanShared), the path VERDICT r18 Missing #1 asked for
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 8,
        lockMode = "verb"))
    try {
      val ev = t(spark, dir, "events")
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      def chrono(df: org.apache.spark.sql.DataFrame) =
        df.select(col("user_id").cast("string").as("key"), col("ts"),
          encode(col("event_type"), "UTF-8").as("data")).as[ChronoRow]
      // seeding + twin builds are SETUP for the bench split — the
      // operator under measurement is the autorouted zero-exchange join
      graft.core.BenchPhases.setup {
        db.createTable("h1"); db.insert("h1", chrono(ev.filter(col("ts") < split)))
        db.createTable("h2"); db.insert("h2", chrono(ev.filter(col("ts") >= split)))
        db.rebuildBucketed("h1"); db.rebuildBucketed("h2")
      }
      // plain table() frames — no bucketedTable() anywhere in sight
      val a = db.table("h1")
        .select(col("key"), decode(col("data"), "UTF-8").as("et_a"))
      val b = db.table("h2")
        .select(col("key"), decode(col("data"), "UTF-8").as("et_b"))
      val agg = a.hint("merge").join(b.hint("merge"), Seq("key"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("et_a") === col("et_b"), 1)).as("n_same"))
      // checkpoint MATERIALIZES the join once: the verdict reads the
      // executed plan's exchange count, and the returned frame reuses
      // the checkpointed rows instead of re-running the join under the
      // driver's action (r15 residual nit)
      val snap = agg.localCheckpoint()
      val routed =
        PlanMetrics.shuffleExchanges(agg.queryExecution.executedPlan) == 0
      snap.withColumn("auto_routed", lit(routed)).orderBy(col("key"))
    } finally db.close()
  }

  /** D31: weighted sampling — per-SOURCE acceptance rates (0.1–0.5,
    * derived from the source number: the dataset-mixing recipe shape)
    * applied as [[Curation.weightedSample]]'s deterministic md5 draw
    * against a per-row threshold. A pure map-side filter at any scale;
    * the oracle reproduces the exact sample from the same formula. */
  def weightedSampleQ(spark: SparkSession, dir: String): DataFrame = {
    val srcn = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
    val rate = ((srcn % 5) + 1).cast("double") / lit(10.0)
    t(spark, dir, "documents")
      .filter(Curation.weightedSample(col("doc_id"), rate))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** D32: negative-pair mining — 2 deterministic pseudo-random
    * negatives per document via [[Curation.negativePairs]] (seeded
    * hash-ring order, 256-bucket partitioned windows; the contrastive-
    * training pair generator). Seed 7 pins the draw; the oracle
    * replicates the hash order exactly. */
  def negativePairsQ(spark: SparkSession, dir: String): DataFrame =
    Curation.negativePairs(t(spark, dir, "documents"), "doc_id",
        k = 2, seed = 7L)
      .orderBy(col("id_a"), col("id_b"))

  /** D33: semantic dedup — the SemDeDup cluster-then-filter recipe over
    * the embedding corpus ([[Dedup.semanticDedup]]): seeded-quantizer
    * assignment into 16 clusters, then drop any vector with a lower-id
    * same-cluster neighbor at cosine >= 0.35 (the fixture's vectors are
    * near-uniform — 0.35 marks the same near-dup tail d2d uses; a real
    * corpus runs 0.95+). Output: the surviving corpus with its cluster.
    */
  def semanticDedupQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedup(t(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, nlist = 16)
      .orderBy(col("vec_id"))

  /** Shared oracle for d33/d33f: same seeded centroids (vec_id < 16),
    * same argmax assignment (cos DESC, cell ASC), same greedy
    * lower-id-wins drop rule — cosine via the shared bit-identical
    * left-fold formulation. */
  private lazy val semanticDedupOracle: String =
    s"""WITH cent AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS cv
       |  FROM embeddings WHERE vec_id < 16),
       |asgn AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |losers AS (
       |  SELECT b.vec_id FROM asgn a JOIN asgn b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35)
       |SELECT vec_id, cell FROM asgn
       |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
       |ORDER BY vec_id""".stripMargin

  /** D33f: the TWO-LEVEL (coarse-then-fine) assignment path of
    * [[Dedup.semanticDedupTwoLevel]] inside the hash gate. With
    * nprobe = ncoarse the probe is EXHAUSTIVE — every fine centroid is
    * a candidate, so the assignment provably equals the flat argmax
    * (same (cos DESC, cell ASC) tie rule) and d33's oracle applies
    * verbatim. What the gate then checks is the two-level MACHINERY —
    * the fine→coarse membership map, the in-row member lookup, the
    * candidate concat, the nested argmax — bit-for-bit against DuckDB;
    * the probe-limited speed/recall trade is measured in BASELINE.md §D
    * (ScaleProbe semantic2). */
  def semanticDedupTwoLevelQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedupTwoLevel(t(spark, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.35, nlist = 16, ncoarse = 4, nprobe = 4)
      .orderBy(col("vec_id"))

  /** D33e: semantic dedup over the FITTED-k-means clustering
    * ([[Dedup.semanticDedupFitted]]) — the quantizer SemDeDup actually
    * runs — declared with a d3e-style self-validating verdict row,
    * since fitted centroids are float aggregates and cannot be oracle
    * literals. Three in-query verdicts ride one SQL-exact anchor (the
    * corpus count):
    *   - keepers_ok: the greedy drop kept a non-empty strict subset
    *     bound (1 ≤ keepers ≤ n);
    *   - dupfree_ok: NO two keepers sharing a fitted cell sit at
    *     cosine ≥ threshold — the structural postcondition of the
    *     greedy lower-id-wins rule, falsifiable by any pairing bug;
    *   - pair_recall_ok: of ALL brute-force duplicate pairs (cosine ≥
    *     threshold over the full corpus — bounded: fixture-scale n²),
    *     the fitted clustering co-locates at least 2× the CHANCE rate
    *     Σ(|cluster|/n)² — the co-location probability of a random
    *     pair, computed in-query from the fitted cluster sizes.
    *     SemDeDup's recall is exactly this co-location fraction
    *     (cross-cluster dups are BY DESIGN never compared), and
    *     normalizing by chance makes the verdict scale-stable where an
    *     absolute floor is not: measured 5.7×/6.7×/4.1× chance at
    *     sf0.001/0.01/0.1 (recall 0.354/0.417/0.258 against ~0.0625),
    *     so the 2× floor sits far under every shipped point — same
    *     margin discipline as d3e. */
  def semanticDedupFittedQ(spark: SparkSession, dir: String): DataFrame = {
    val cos = NativeExpressions.cosineNative _
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val kept = Dedup.semanticDedupFitted(emb, "vec_id", "embedding",
      threshold = 0.35, nlist = 16)
    val kv = kept.join(emb, Seq("vec_id"))
    val viol = kv.as("a")
      .join(kv.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(cos(col("a.embedding"), col("b.embedding")) >= 0.35)
      .agg(count(lit(1)).as("n_viol"))
    val asg = Dedup.semanticClustersFitted(emb, "vec_id", "embedding", 16)
    val pairs = emb.as("x")
      .join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .filter(cos(col("x.embedding"), col("y.embedding")) >= 0.35)
      .select(col("x.vec_id").as("ida"), col("y.vec_id").as("idb"))
    val recall = pairs
      .join(asg.select(col("vec_id").as("ida"), col("cell").as("ca")), Seq("ida"))
      .join(asg.select(col("vec_id").as("idb"), col("cell").as("cb")), Seq("idb"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("ca") === col("cb"), 1)).as("n_coloc"))
    // chance co-location of a random pair under these cluster sizes
    val chance = asg.groupBy(col("cell"))
      .agg(count(lit(1)).cast("double").as("m"))
      .agg(sum(col("m") * col("m")).as("ss"))
    emb.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(kept.agg(count(lit(1)).as("n_keepers")))
      .crossJoin(viol)
      .crossJoin(recall)
      .crossJoin(chance)
      .select(col("n_vecs"), lit(16).as("nlist"),
        (col("n_keepers") >= 1 && col("n_keepers") <= col("n_vecs"))
          .as("keepers_ok"),
        (col("n_viol") === 0).as("dupfree_ok"),
        (col("n_pairs") === 0 ||
          col("n_coloc").cast("double") / col("n_pairs") >=
            lit(2.0) * col("ss") /
              (col("n_vecs").cast("double") * col("n_vecs")))
          .as("pair_recall_ok"))
  }

  /** D33g: the PRODUCTION SemDeDup composition — FITTED k-means
    * codebook under the TWO-LEVEL probe assignment
    * ([[Dedup.semanticDedupFittedTwoLevel]]; d33e gates fitted-flat,
    * d33f gates seeded-two-level, this gates their composition). Same
    * self-validation discipline as d33e, with the composition-specific
    * verdict first:
    *   - assign_ok: with nprobe = ncoarse (EXHAUSTIVE probe) the
    *     two-level assignment over the fitted codebook must equal the
    *     flat cosine argmax over the SAME codebook on every corpus row
    *     — the machinery check d33f makes against the DuckDB oracle,
    *     re-made here against the in-Spark flat reference because
    *     fitted centroids are float aggregates, not oracle literals;
    *   - keepers_ok / dupfree_ok: the d33e keeper-bound and
    *     greedy-rule postcondition over the composed clustering. */
  def semanticDedupFittedTwoLevelQ(
      spark: SparkSession, dir: String): DataFrame = {
    val cos = NativeExpressions.cosineNative _
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val fine = Dedup.fittedCentroids(emb, "vec_id", "embedding", nlist = 16)
    val two = Dedup.assignTwoLevel(emb, "vec_id", "embedding", fine,
      ncoarse = 4, nprobe = 4)
    val flat = Dedup.assignFlat(emb, "vec_id", "embedding", fine)
    val mism = two.withColumnRenamed("cell", "c2")
      .join(flat.withColumnRenamed("cell", "cf"), Seq("vec_id"))
      .agg(count(when(col("c2") =!= col("cf"), 1)).as("n_mism"))
    val kept = Dedup.semanticDedupTwoLevelOver(emb, "vec_id", "embedding",
      threshold = 0.35, fine, ncoarse = 4, nprobe = 4)
    val kv = kept.join(emb, Seq("vec_id"))
    val viol = kv.as("a")
      .join(kv.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(cos(col("a.embedding"), col("b.embedding")) >= 0.35)
      .agg(count(lit(1)).as("n_viol"))
    emb.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(kept.agg(count(lit(1)).as("n_keepers")))
      .crossJoin(mism)
      .crossJoin(viol)
      .select(col("n_vecs"), lit(16).as("nlist"), lit(4).as("ncoarse"),
        (col("n_mism") === 0).as("assign_ok"),
        (col("n_keepers") >= 1 && col("n_keepers") <= col("n_vecs"))
          .as("keepers_ok"),
        (col("n_viol") === 0).as("dupfree_ok"))
  }

  /** D33h: ADAPTIVE probe selection for the production SemDeDup shape
    * ([[Dedup.adaptiveNprobe]] + [[Dedup.semanticDedupTwoLevelOver]]) —
    * the r14 caveat (coarse-probe agreement 0.63 on the near-uniform
    * fixture geometry, nothing escalating) turned into a measured
    * lever: sampled agreement against the flat argmax chooses the probe
    * width, doubling until the 0.9 floor clears. On THIS fixture the
    * geometry is adversarial by design, so the selection provably
    * escalates (full-corpus agreement measures 0.54 at nprobe=1 and
    * 0.73 at nprobe=2 at BOTH gate SFs — deterministic, hash-derived
    * sample, fitted codebook under fixed seed) and lands exhaustive
    * where agreement is 1 by construction. Verdicts (d33e pattern —
    * fitted centroids are float aggregates, not oracle literals):
    * escalated_ok (the ladder ran), agreement_ok (floor reached),
    * assign_floor_ok (FULL-corpus agreement at the chosen width also
    * clears the floor — the sample's promise held), keepers_ok /
    * dupfree_ok over the dedup at the chosen width. */
  def semanticDedupAdaptiveQ(spark: SparkSession, dir: String): DataFrame = {
    val cos = NativeExpressions.cosineNative _
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val fine = Dedup.fittedCentroids(emb, "vec_id", "embedding", nlist = 16)
    val choice = Dedup.adaptiveNprobe(emb, "vec_id", "embedding", fine,
      ncoarse = 4, floor = 0.9, sampleMod = 8, startNprobe = 1)
    val two = Dedup.assignTwoLevel(emb, "vec_id", "embedding", fine,
      ncoarse = 4, nprobe = choice.nprobe)
    val flat = Dedup.assignFlat(emb, "vec_id", "embedding", fine)
    val fullAgree = two.withColumnRenamed("cell", "c2")
      .join(flat.withColumnRenamed("cell", "cf"), Seq("vec_id"))
      .agg(avg(when(col("c2") === col("cf"), 1.0).otherwise(0.0))
        .as("full_agree"))
    val kept = Dedup.semanticDedupTwoLevelOver(emb, "vec_id", "embedding",
      threshold = 0.35, fine, ncoarse = 4, nprobe = choice.nprobe)
    val kv = kept.join(emb, Seq("vec_id"))
    val viol = kv.as("a")
      .join(kv.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(cos(col("a.embedding"), col("b.embedding")) >= 0.35)
      .agg(count(lit(1)).as("n_viol"))
    emb.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(kept.agg(count(lit(1)).as("n_keepers")))
      .crossJoin(fullAgree)
      .crossJoin(viol)
      .select(col("n_vecs"), lit(16).as("nlist"), lit(4).as("ncoarse"),
        lit(choice.nprobe > 1 && choice.steps > 1).as("escalated_ok"),
        lit(choice.agreement >= 0.9).as("agreement_ok"),
        (col("full_agree") >= 0.9).as("assign_floor_ok"),
        (col("n_keepers") >= 1 && col("n_keepers") <= col("n_vecs"))
          .as("keepers_ok"),
        (col("n_viol") === 0).as("dupfree_ok"))
  }

  /** D34: model-based quality filtering — the hashed linear scorer
    * ([[Curation.hashedQualityScore]]) over every document; emits the
    * score and the keep decision rather than filtering, so the oracle
    * pins the full score surface (the filter form is `WHERE kept = 1`).
    * Scores are bit-identical cross-engine (exact int64 weights, one
    * defined fold order), so no rounding is needed. */
  def qualityClassifierQ(spark: SparkSession, dir: String): DataFrame = {
    val score = Curation.hashedQualityScore(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"), score.as("q_score"))
      .withColumn("kept", (col("q_score") >= 0.0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** D35: cross-document repeated-span REMOVAL
    * ([[Dedup.substringDedup]], the Lee-et-al substring-dedup recipe
    * window-wise) — w=8 token windows shared by ≥2 docs mark positions
    * to drop; output is the REWRITTEN corpus plus removal counts, so
    * the oracle pins span detection, position cover, and text
    * reconstruction in one hash. w=8 is long enough that natural
    * prose never collides (d13's 3-gram boilerplate metric saturates
    * at that length) and short enough that the fixture's near-dup
    * documents produce real spans. */
  def substringDedupQ(spark: SparkSession, dir: String): DataFrame =
    // exact grams EXPLICITLY: this declared form exists for the DuckDB
    // oracle (no xxhash64 there); the production default is hashed
    // grams, declared + hash-gated by d35b below
    Dedup.substringDedup(
        t(spark, dir, "documents"), "doc_id", "text", w = 8,
        hashGrams = false)
      .orderBy(col("doc_id"))

  /** D35b: the hashed-gram PRODUCTION DEFAULT of [[Dedup.substringDedup]],
    * declared self-validating (the d33e pattern): the hashed form's
    * full output joins the exact form's, and per-row equality verdicts
    * ride the declared output — the oracle replicates the exact recipe
    * and asserts the verdicts, so the hash gate proves default ≡ exact
    * on the fixture (collisions at 64 bits over this corpus: none). */
  def substringDedupHashedQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val hashed = Dedup.substringDedup(docs, "doc_id", "text", w = 8)
    val exact = Dedup.substringDedup(docs, "doc_id", "text", w = 8,
        hashGrams = false)
      .select(col("doc_id"), col("n_removed").as("x_removed"),
        col("clean_text").as("x_clean"))
    hashed.join(exact, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("clean_text"),
        (col("n_removed") === col("x_removed") &&
          col("clean_text") === col("x_clean")).as("matches_exact"))
      .orderBy(col("doc_id"))
  }

  /** D37: within-document repeated-span removal
    * ([[Dedup.substringSelfDedup]]) — the self-dedup complement of d35:
    * w=6 windows whose gram started earlier in the SAME document mark
    * positions to drop (keep-first). w=6 < d35's 8 because within-doc
    * repetition (nav blocks, chorus lines) is shorter-period than
    * cross-doc boilerplate. */
  def substringSelfDedupQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringSelfDedup(
        t(spark, dir, "documents"), "doc_id", "text", w = 6)
      .orderBy(col("doc_id"))

  /** D15: Z-order layout key — the Morton interleave of (user_id, ts)
    * that multi-dimensional range pruning sorts by at scale (the
    * reference's tablets are time-ordered only; this generalizes its
    * min/max pruning to 2-D predicates). Domains are FIXED literals
    * ([0,2047] users, January 2024 in µs) so the key is stable across
    * scale factors and engines; pure integer arithmetic throughout —
    * see [[Layout.scaleToBits]] for why fp division would corrupt the
    * curve past 2^53. */
  def zorderQ(spark: SparkSession, dir: String): DataFrame =
    Layout.zOrderBy(
        t(spark, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")),
        "user_id", 0L, 2047L,
        "ts_us", 1704067200000000L, 1706745599999999L, bits = 16)
      .select(col("event_id"), col("zval"))
      .orderBy(col("zval"), col("event_id"))

  /** d15b: the n-D generalization (Layout.zValueN) on THREE dimensions —
    * user, time, and event-type lead byte — the 3–4-column clustering a
    * table format actually runs. 3 dims × 16 bits = 48-bit key; same
    * fixed-literal domains (SF-stable) and exact integer scaling as d15.
    * ascii(event_type) is a stand-in low-cardinality dimension whose
    * codepoint both engines agree on (values are plain ASCII words). */
  def zorder3Q(spark: SparkSession, dir: String): DataFrame =
    Layout.zOrderByN(
        t(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            ascii(col("event_type")).cast("long").as("et")),
        Seq(("user_id", 0L, 2047L),
          ("ts_us", 1704067200000000L, 1706745599999999L),
          ("et", 0L, 127L)), bits = 16)
      .select(col("event_id"), col("zval"))
      .orderBy(col("zval"), col("event_id"))

  /** The hyperplane matrix used by the LSH queries (bands=16 ×
    * bitsPerBand=4 → 64 planes, seed=42, dim=64) rendered as a DuckDB
    * list-of-lists literal. The matrix is data-independent and
    * deterministic (NativeExpressions.hyperplaneComponent), so the
    * oracle can evaluate the exact banding predicate the Spark side
    * uses. Double.toString emits the shortest round-trip decimal, so
    * DuckDB parses back the bit-identical double. */
  private lazy val planesLiteral: String =
    (0 until 64).map { b =>
      (0 until 64).map(d =>
        graft.functions.NativeExpressions.hyperplaneComponent(b, d, 42).toString)
        .mkString("[", ",", "]")
    }.mkString("[", ",", "]")

  /** Bit-identical cosine in DuckDB SQL — the same formulation the d3
    * oracle hash-matches against Kernels.cosine. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x,y) -> x + y)
       |    / (sqrt(list_reduce(list_transform($a,
       |          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x,y) -> x + y))
       |     * sqrt(list_reduce(list_transform($b,
       |          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x,y) -> x + y)))""".stripMargin

  /** Bit-identical squared L2 between 8-wide subspace `j` of two
    * vectors — the DuckDB twin of Similarity.pqTopK's `subdist`
    * (ordered left fold of (float→double) arithmetic; the 0.0-seeded
    * Spark fold and the seedless list_reduce agree exactly because
    * 0.0 + x == x for the non-negative squares involved). */
  private def sqdSql(a: String, b: String, j: String): String =
    s"""list_reduce(list_transform(list_zip(
       |          list_slice($a, $j*8+1, $j*8+8), list_slice($b, $j*8+1, $j*8+8)),
       |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |           * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (x,y) -> x + y)""".stripMargin

  /** Shared oracle skeleton for the hyperplane-LSH queries: recompute
    * signatures from the embedded plane matrix (sign-dot left fold in
    * the same order as HyperplaneSigExpr), join on (band, bucket) —
    * exactly the Spark candidate condition — then exact cosine, fan to
    * both directions, rank. `tail` selects from `ranked`. */
  private def lshOracle(tail: String): String =
    s"""WITH m AS (SELECT $planesLiteral AS pl),
       |sg AS (
       |  SELECT vec_id, embedding,
       |    list_transform(generate_series(1, 64), b ->
       |      CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(list_zip(embedding, pl[b]),
       |            p -> CAST(p[1] AS DOUBLE) * p[2])), (x,y) -> x + y) >= 0
       |      THEN 1 ELSE 0 END) AS sig
       |  FROM embeddings, m),
       |bnd AS (
       |  SELECT vec_id, band,
       |         array_to_string(sig[(band-1)*4+1:(band-1)*4+4], '') AS bucket
       |  FROM sg, generate_series(1, 16) g(band)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bnd a JOIN bnd b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |pc AS (
       |  SELECT id_a, id_b, ${cosSql("x.embedding", "y.embedding")} AS cos
       |  FROM cand JOIN embeddings x ON x.vec_id = cand.id_a
       |            JOIN embeddings y ON y.vec_id = cand.id_b),
       |sym AS (
       |  SELECT id_a AS qid, id_b AS nid, cos FROM pc
       |  UNION ALL SELECT id_b, id_a, cos FROM pc),
       |ranked AS (
       |  SELECT qid AS query_id, nid AS neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY qid
       |                                 ORDER BY cos DESC, nid) AS INTEGER) AS rank
       |  FROM sym)
       |$tail""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("d1_dedup_exact", dedupExact, Some(
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin),
      headline = true),
    QueryDef("d2_minhash_neardup", minhashNearDup, Some(
      """WITH d AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 2),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         len(list_intersect(a.sh, b.sh)) AS inter,
        |         len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/CAST(uni AS DOUBLE) AS jaccard
        |FROM pairs WHERE uni > 0 AND CAST(inter AS DOUBLE)/CAST(uni AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin),
      headline = true),
    QueryDef("d2b_simhash_neardup", simhashNearDup, Some(
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(toks, tk ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(tk, ''), c -> CAST(unicode(c) AS BIGINT))),
        |        (a, c) -> (a * 131 + c) % 2147483647) * 2147483648
        |    + list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(tk, ''), c -> CAST(unicode(c) AS BIGINT))),
        |        (a, c) -> (a * 137 + c) % 2147483629)) AS hs
        |  FROM t),
        |s AS (
        |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(0, 61), j ->
        |        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
        |               list_transform(hs, x -> CAST(2 * ((x >> j) & 1) - 1 AS BIGINT))),
        |             (a, b) -> a + b) > 0
        |        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
        |    (a, b) -> a | b) AS sig
        |  FROM h),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE ((a.sig >> 0)  & 65535) = ((b.sig >> 0)  & 65535)
        |     OR ((a.sig >> 16) & 65535) = ((b.sig >> 16) & 65535)
        |     OR ((a.sig >> 32) & 65535) = ((b.sig >> 32) & 65535)
        |     OR ((a.sig >> 48) & 65535) = ((b.sig >> 48) & 65535))
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 8
        |ORDER BY id_a, id_b""".stripMargin)),
    QueryDef("d2c_ngram_jaccard", ngramJaccardQ, Some(
      """WITH d AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 2),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         len(list_intersect(a.sh, b.sh)) AS inter,
        |         len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1)
        |SELECT id_a, id_b,
        |       round(CASE WHEN uni = 0 THEN 0.0
        |                  ELSE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) END, 6) AS jaccard
        |FROM pairs ORDER BY id_a""".stripMargin)),
    QueryDef("d2d_embedding_neardup", embeddingNearDup, Some(lshOracle(
      """SELECT query_id AS id_a, neighbor_id AS id_b, cos FROM ranked
        |WHERE rank <= 20 AND cos >= 0.4 AND query_id < neighbor_id
        |ORDER BY id_a, id_b""".stripMargin))),
    QueryDef("d2e_dedup_pipeline", dedupPipeline, Some(
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 2),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  WHERE len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("d36_quality_dedup", qualityDedupQ, Some(
      // d2e's cluster CTE + d34's exact score expression; keeper =
      // per-component argmax by (q_score DESC, id ASC)
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 2),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  WHERE len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) = 0 THEN 0.0 ELSE
        |      list_reduce(list_transform(w, t ->
        |        CAST((((strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16
        |               + strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1)
        |              * 2654435761 + 104729) % 2001 AS DOUBLE) / 1000.0 - 1.0),
        |        (a, b) -> a + b) / len(w)
        |    END AS q_score
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |m AS (SELECT comp.id, comp.component, s.q_score
        |      FROM comp JOIN s ON s.doc_id = comp.id),
        |wi AS (SELECT id, row_number() OVER (
        |         PARTITION BY component ORDER BY q_score DESC, id ASC) AS rk
        |       FROM m)
        |SELECT s.doc_id, s.q_score FROM s
        |WHERE s.doc_id NOT IN (SELECT id FROM wi WHERE rk > 1)
        |ORDER BY s.doc_id""".stripMargin)),
    QueryDef("d3_similarity_topk", similarityTopK, Some(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_reduce(list_transform(list_zip(q.qe, e.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a,b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(q.qe,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))
        |     * sqrt(list_reduce(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))) AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM pairs)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      headline = true),
    QueryDef("d3d_similarity_agg", similarityTopKAgg, Some(
      // identical semantics (and oracle) to d3: exact top-5 by (cos desc,
      // neighbor_id) — only the Spark-side physical shape differs
      // (bounded-heap aggregate vs window sort)
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_reduce(list_transform(list_zip(q.qe, e.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a,b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(q.qe,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))
        |     * sqrt(list_reduce(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))) AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM pairs)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    QueryDef("d3b_similarity_lsh", similarityLsh, Some(lshOracle(
      """SELECT query_id, rank, neighbor_id, cos FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))),
    QueryDef("d3c_similarity_ivf", similarityIvf, Some(
      // the sampled-quantizer IVF pipeline in SQL: same cells, same
      // argmax assignment (cos DESC, cell ASC), same nprobe probes,
      // same candidate ranking — cosine via the shared bit-identical
      // left-fold formulation
      s"""WITH cent AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS cv
         |  FROM embeddings WHERE vec_id < 16),
         |asgn AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.vec_id AS qid, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.cv")} DESC, c.cell) AS rn
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8)
         |  WHERE rn <= 6),
         |cand AS (
         |  SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
         |         ${cosSql("q.embedding", "a.embedding")} AS cos
         |  FROM probes p
         |  JOIN asgn a ON a.cell = p.cell
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  WHERE a.vec_id <> p.qid)
         |SELECT query_id, rank, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM cand)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    QueryDef("d3f_similarity_int8", similarityQuantized, Some(
      // codes: fixed-order IEEE normalize + floor + clamp (norm starts
      // at 0.0 in the kernel; 0.0 + x0² == x0², so the un-seeded
      // list_reduce matches); candidate rank: exact int64 dot; rescore:
      // the shared bit-identical cosine formulation
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |code AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x ->
        |      CAST(least(greatest(floor(CAST(x AS DOUBLE) / nrm * 127.0),
        |                          -127.0), 127.0) AS BIGINT)) AS code
        |  FROM n WHERE nrm <> 0),
        |q AS (SELECT vec_id AS query_id, code AS qcode FROM code WHERE vec_id < 8),
        |cand AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_reduce(list_transform(list_zip(q.qcode, c.code),
        |        p -> p[1] * p[2]), (a,b) -> a + b) AS qdot
        |  FROM q, code c WHERE c.vec_id <> q.query_id),
        |topc AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY qdot DESC, neighbor_id) AS crank
        |    FROM cand) WHERE crank <= 16),
        |resc AS (
        |  SELECT t.query_id, t.neighbor_id,
        |    list_reduce(list_transform(list_zip(qe.embedding, e.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a,b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(qe.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))
        |     * sqrt(list_reduce(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))) AS cos
        |  FROM topc t
        |  JOIN embeddings qe ON qe.vec_id = t.query_id
        |  JOIN embeddings e ON e.vec_id = t.neighbor_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM resc) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),
    QueryDef("d3g_similarity_ivf_int8", similarityIvfQuantized, Some(
      // the d3c cells/assignment/probes fused with the d3f codes: rank
      // candidates INSIDE probed cells by exact int64 dot, rescore the
      // 16 survivors with the shared bit-identical cosine
      s"""WITH cent AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS cv
         |  FROM embeddings WHERE vec_id < 16),
         |asgn AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.vec_id AS qid, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.cv")} DESC, c.cell) AS rn
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8)
         |  WHERE rn <= 6),
         |n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_transform(embedding,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b)) AS nrm
         |  FROM embeddings),
         |code AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x ->
         |      CAST(least(greatest(floor(CAST(x AS DOUBLE) / nrm * 127.0),
         |                          -127.0), 127.0) AS BIGINT)) AS code
         |  FROM n WHERE nrm <> 0),
         |cand AS (
         |  SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
         |    list_reduce(list_transform(list_zip(qc.code, cc.code),
         |        pr -> pr[1] * pr[2]), (a2,b2) -> a2 + b2) AS qdot
         |  FROM probes p
         |  JOIN asgn a ON a.cell = p.cell
         |  JOIN code cc ON cc.vec_id = a.vec_id
         |  JOIN code qc ON qc.vec_id = p.qid
         |  WHERE a.vec_id <> p.qid),
         |topc AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY qdot DESC, neighbor_id) AS crank
         |    FROM cand) WHERE crank <= 16),
         |resc AS (
         |  SELECT t.query_id, t.neighbor_id,
         |    ${cosSql("qe.embedding", "e.embedding")} AS cos
         |  FROM topc t
         |  JOIN embeddings qe ON qe.vec_id = t.query_id
         |  JOIN embeddings e ON e.vec_id = t.neighbor_id)
         |SELECT query_id, rank, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM resc) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin)),
    QueryDef("d3h_similarity_pq", similarityPq, Some(
      // full PQ replication: sampled codebook, per-subspace argmin
      // encoding (ordered fold, ties -> smaller cell), ordered ADC sum
      // over subspaces, 16 ADC survivors rescored by the shared
      // bit-identical cosine
      s"""WITH cent AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS cv
         |  FROM embeddings WHERE vec_id < 16),
         |g AS (SELECT CAST(j AS INTEGER) AS j FROM generate_series(0, 7) t(j)),
         |code AS (
         |  SELECT vec_id, j, cell FROM (
         |    SELECT e.vec_id, g.j, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id, g.j
         |        ORDER BY ${sqdSql("e.embedding", "c.cv", "g.j")} ASC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN g CROSS JOIN cent c)
         |  WHERE rn = 1),
         |ad AS (
         |  SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(${sqdSql("q.embedding", "c.cv", "cd.j")} ORDER BY cd.j)),
         |      (x,y) -> x + y) AS ad
         |  FROM embeddings q
         |  CROSS JOIN code cd
         |  JOIN cent c ON c.cell = cd.cell
         |  WHERE q.vec_id < 8 AND cd.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, cd.vec_id),
         |topc AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY ad ASC, neighbor_id) AS crank
         |    FROM ad) WHERE crank <= 16),
         |resc AS (
         |  SELECT t.query_id, t.neighbor_id,
         |    ${cosSql("qe.embedding", "e.embedding")} AS cos
         |  FROM topc t
         |  JOIN embeddings qe ON qe.vec_id = t.query_id
         |  JOIN embeddings e ON e.vec_id = t.neighbor_id)
         |SELECT query_id, rank, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM resc) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin)),
    QueryDef("d3e_similarity_ivf_fitted", similarityIvfFitted, Some(
      // self-validating (q22 pattern): exact anchor = the query count;
      // the recall verdict is computed in-query against brute force and
      // must come out TRUE — see similarityIvfFitted's threshold margin
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, 5 AS k,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 32""".stripMargin)),
    QueryDef("d44_ann_index_serve", annIndexServeQ, Some(
      // self-validating (d3e pattern): exact anchor = the query count;
      // recall + the whole index lifecycle (survives compact, refuses
      // after row mutation, rebuilds from stored parameters) are
      // in-query verdicts that must all come out TRUE
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, 5 AS k,
        |       TRUE AS recall_ok, TRUE AS survives_compact,
        |       TRUE AS serves_through_insert,
        |       TRUE AS stale_detected, TRUE AS rebuilt,
        |       TRUE AS serves_after_rebuild
        |FROM embeddings WHERE vec_id < 32""".stripMargin)),
    QueryDef("d44b_ann_delta_serve", annDeltaServeQ, Some(
      // NOT self-validating: with exhaustive probes the delta-serve
      // union (stored cells ∪ exact post-build-file scan) equals
      // brute-force top-k over the full table EXACTLY, so the oracle
      // is the same brute-force SQL as d3 — every row hash-checked,
      // independent of the fitted centroid values
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_reduce(list_transform(list_zip(q.qe, e.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a,b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(q.qe,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))
        |     * sqrt(list_reduce(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))) AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM pairs)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    QueryDef("d45_semantic_dedup_stored", semanticDedupStoredQ, Some(
      // self-validating: the corpus count anchors; the integrity
      // verdict (stored lists exactly re-derivable from `_ann`), the
      // d33e dup-free invariant and keeper bound must all come out TRUE
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs, 16 AS nlist,
        |       TRUE AS keepers_ok, TRUE AS dupfree_ok,
        |       TRUE AS stored_matches_centroids
        |FROM embeddings""".stripMargin)),
    QueryDef("d4_text_stats", textStats, Some(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars2,
        |  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |       t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS INTEGER) AS n_stop,
        |  round(CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |       t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
        |    / greatest(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE), 1.0), 6) AS stop_ratio,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                        t -> CAST(length(t) AS DOUBLE))), (a,b) -> a + b)
        |    / greatest(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE), 1.0), 6) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("d4b_text_quality", textQuality, Some(
      """WITH base AS (
        |  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, text, toks,
        |    greatest(CAST(len(toks) AS DOUBLE), 1.0) AS n,
        |    CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','is','with','that','for'))) AS DOUBLE) AS h_en,
        |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','mit','ein'))) AS DOUBLE) AS h_de,
        |    CAST(len(list_filter(toks, t -> t IN ('le','la','les','et','est','pas','pour','une'))) AS DOUBLE) AS h_fr,
        |    CAST(len(list_filter(toks, t -> t IN ('el','los','las','es','por','para','una','que'))) AS DOUBLE) AS h_es,
        |    CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0 AS s_zh,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio
        |  FROM base),
        |langed AS (
        |  SELECT doc_id, text, toks, n, n_stop, punct_ratio,
        |    h_en / n AS s_en, h_de / n AS s_de, h_fr / n AS s_fr, h_es / n AS s_es, s_zh,
        |    greatest(h_en / n, h_de / n, h_fr / n, h_es / n, s_zh) AS best
        |  FROM scored)
        |SELECT doc_id,
        |  CASE WHEN best <= 0 THEN 'und'
        |       WHEN s_en = best THEN 'en'
        |       WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr'
        |       WHEN s_es = best THEN 'es'
        |       WHEN s_zh = best THEN 'zh'
        |       ELSE 'und' END AS lang_guess,
        |  round(
        |    (CASE WHEN CAST(len(toks) AS DOUBLE) < 5 THEN CAST(len(toks) AS DOUBLE) / 5.0
        |          WHEN CAST(len(toks) AS DOUBLE) > 5000 THEN 0.2 ELSE 1.0 END)
        |    * (CASE WHEN punct_ratio > 0.2 THEN 0.3 ELSE 1.0 END)
        |    * (CASE WHEN n_stop / n < 0.005 THEN 0.5 ELSE 1.0 END), 6) AS quality,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'),
        |                   t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS BIGINT))),
        |    (a, b) -> a + b) AS BIGINT) AS bpe_tokens
        |FROM langed ORDER BY doc_id""".stripMargin)),
    QueryDef("d4d_repetition", repetitionStats, Some(
      """WITH tk AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM tk WHERE len(w) >= 2),
        |c AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |       CAST(MAX(c) AS BIGINT) AS max_bg,
        |       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    QueryDef("d4f_pii_redact", piiRedact, Some(
      """WITH synth AS (
        |  SELECT doc_id,
        |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@' || source || '.org from 10.0.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.7 card 4111111111111111' AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(s,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INTEGER) AS n_email,
        |  regexp_replace(regexp_replace(regexp_replace(s,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |    '\d{9,}', '[NUM]', 'g') AS redacted
        |FROM synth ORDER BY doc_id""".stripMargin)),
    QueryDef("d4e_ngram_topk", ngramTopK, Some(
      """WITH tk AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(w) - 1),
        |           i -> array_to_string(w[i:i+2], ' '))) AS ngram
        |  FROM tk WHERE len(w) >= 3)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM grams
        |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin)),
    QueryDef("d4c_fingerprint", textFingerprint, Some(
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(split(array_to_string(
        |          regexp_extract_all(lower(text), '[a-z0-9]+'), ' '), ''),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("d5_multimodal_meta", multimodalMeta, Some(
      """SELECT doc_id AS media_id, 'text/plain' AS media_type,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin)),
    QueryDef("d5c_multimodal_decode", multimodalDecode, Some(
      // FakeDecoder in SQL: same HUGEINT wrap emulation as d5b; width
      // needs the signed floorMod (h may be negative as a signed 64-bit
      // value), height/frames shift first (>>> makes them non-negative)
      """WITH b AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |    list_transform(split(substr(text, 1, 256), ''),
        |                   c -> CAST(unicode(c) AS HUGEINT)) AS bs
        |  FROM documents),
        |h AS (
        |  SELECT media_id, byte_len,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), bs),
        |      (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS h64
        |  FROM b)
        |SELECT media_id, 'text/plain' AS media_type, byte_len,
        |  CAST(16 + ((((h64 - CASE WHEN h64 >= 9223372036854775808
        |                           THEN 18446744073709551616
        |                           ELSE CAST(0 AS HUGEINT) END)
        |               % 240) + 240) % 240) AS INTEGER) AS width,
        |  CAST(16 + (h64 // 256) % 240 AS INTEGER) AS height,
        |  CAST(1 + (h64 // 65536) % 32 AS INTEGER) AS n_frames
        |FROM h ORDER BY media_id""".stripMargin)),
    QueryDef("d5b_multimodal_features", multimodalFeatures, Some(
      // replicates the stub encoder exactly: the signed-64 rolling byte
      // hash is emulated with HUGEINT arithmetic (wrap = % 2^64, then
      // reinterpret as signed), floorMod via ((x % m) + m) % m, and one
      // float32 rounding point at the end — fixture text is pure ASCII
      // so chars == UTF-8 bytes (verified at all SFs). Output is scalar
      // cells (media_id, dim, value) matching the posexploded Spark form.
      """WITH b AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(split(substr(text, 1, 256), ''),
        |                   c -> CAST(unicode(c) AS HUGEINT)) AS bs
        |  FROM documents),
        |h AS (
        |  SELECT media_id,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), bs),
        |      (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS h64
        |  FROM b),
        |w AS (
        |  SELECT media_id, d,
        |         (h64 * (2*d+1) + d) % 18446744073709551616 AS wrapped
        |  FROM h, generate_series(0, 15) g(d))
        |SELECT media_id, CAST(d AS INTEGER) AS dim,
        |  CAST(
        |    CAST(((wrapped
        |           - CASE WHEN wrapped >= 9223372036854775808
        |                  THEN 18446744073709551616
        |                  ELSE CAST(0 AS HUGEINT) END
        |          ) % 2001 + 2001) % 2001 AS DOUBLE) / 1000.0 - 1.0
        |    AS FLOAT4) AS value
        |FROM w
        |ORDER BY media_id, dim""".stripMargin)),
    QueryDef("d5d_frame_sample", multimodalFrames, Some(
      // n_frames via the d5c HUGEINT wrap emulation, then the same
      // strided index series the Spark explode produces
      """WITH b AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(split(substr(text, 1, 256), ''),
        |                   c -> CAST(unicode(c) AS HUGEINT)) AS bs
        |  FROM documents),
        |h AS (
        |  SELECT media_id,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), bs),
        |      (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS h64
        |  FROM b),
        |m AS (SELECT media_id, CAST(1 + (h64 // 65536) % 32 AS INTEGER) AS n_frames
        |      FROM h)
        |SELECT media_id,
        |  CAST(unnest(generate_series(0, n_frames - 1, 2)) AS INTEGER) AS frame_idx
        |FROM m ORDER BY media_id, frame_idx""".stripMargin)),
    QueryDef("d5f_image_hashes", imageHashQ, Some(
      // pixel-exact recomputation of the REAL PNG round-trip: the
      // generator formula (small-integer RGB), integer luma, 4×4 block
      // average, then aHash (bit i iff cell > floor-mean; HUGEINT
      // bit-sum wrapped to signed BIGINT — the d5b emulation) and
      // dHash (horizontal neighbor compare within the 8×8 grid, 56
      // bits). PNG losslessness is what makes this oracle legal: the
      // Spark side must decode back the exact bytes the formula wrote.
      """WITH px AS (
        |  SELECT doc_id AS media_id, x, y,
        |         (doc_id*31 + x*7 + y*13) % 256 AS r,
        |         (doc_id*17 + x*11 + y*5) % 256 AS g,
        |         (doc_id*23 + x*3 + y*19) % 256 AS b
        |  FROM documents,
        |       generate_series(0, 31) gx(x), generate_series(0, 31) gy(y)),
        |cells AS (
        |  SELECT media_id, (y // 4) * 8 + (x // 4) AS i,
        |         SUM((299*r + 587*g + 114*b) // 1000) // 16 AS cell
        |  FROM px GROUP BY media_id, (y // 4) * 8 + (x // 4)),
        |m AS (SELECT media_id, SUM(cell) // 64 AS mean
        |      FROM cells GROUP BY media_id),
        |ah AS (
        |  SELECT c.media_id,
        |         SUM(CASE WHEN c.cell > m.mean
        |                  THEN CAST(1 AS HUGEINT) << CAST(c.i AS INTEGER)
        |                  ELSE CAST(0 AS HUGEINT) END) AS ua
        |  FROM cells c JOIN m ON c.media_id = m.media_id
        |  GROUP BY c.media_id),
        |dh AS (
        |  SELECT a.media_id,
        |         SUM(CASE WHEN a.cell < b.cell
        |                  THEN CAST(1 AS HUGEINT)
        |                       << CAST((a.i // 8) * 7 + (a.i % 8) AS INTEGER)
        |                  ELSE CAST(0 AS HUGEINT) END) AS ud
        |  FROM cells a JOIN cells b
        |    ON a.media_id = b.media_id AND b.i = a.i + 1 AND (a.i % 8) < 7
        |  GROUP BY a.media_id)
        |SELECT ah.media_id, 32 AS width, 32 AS height,
        |  CAST(ua - CASE WHEN ua >= 9223372036854775808
        |                 THEN 18446744073709551616
        |                 ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS ahash,
        |  CAST(ud AS BIGINT) AS dhash
        |FROM ah JOIN dh ON ah.media_id = dh.media_id
        |ORDER BY ah.media_id""".stripMargin)),
    QueryDef("d5j_resize_real", resizeRealQ, Some(
      // the RESIZED image recomputed from the generator formula: the
      // exact NN kernel at 32→16 maps output pixel (x,y) to source
      // (2x,2y), so px evaluates the d5f formula at doubled
      // coordinates; the 16×16 image's 8×8 grid is a 2×2 block average
      // (sum // 4); aHash/dHash identical to d5f's emulation. Both
      // codecs are lossless PNG, so every value is pixel-exact.
      """WITH px AS (
        |  SELECT doc_id AS media_id, x, y,
        |         (doc_id*31 + (2*x)*7 + (2*y)*13) % 256 AS r,
        |         (doc_id*17 + (2*x)*11 + (2*y)*5) % 256 AS g,
        |         (doc_id*23 + (2*x)*3 + (2*y)*19) % 256 AS b
        |  FROM documents,
        |       generate_series(0, 15) gx(x), generate_series(0, 15) gy(y)),
        |cells AS (
        |  SELECT media_id, (y // 2) * 8 + (x // 2) AS i,
        |         SUM((299*r + 587*g + 114*b) // 1000) // 4 AS cell
        |  FROM px GROUP BY media_id, (y // 2) * 8 + (x // 2)),
        |m AS (SELECT media_id, SUM(cell) // 64 AS mean
        |      FROM cells GROUP BY media_id),
        |ah AS (
        |  SELECT c.media_id,
        |         SUM(CASE WHEN c.cell > m.mean
        |                  THEN CAST(1 AS HUGEINT) << CAST(c.i AS INTEGER)
        |                  ELSE CAST(0 AS HUGEINT) END) AS ua
        |  FROM cells c JOIN m ON c.media_id = m.media_id
        |  GROUP BY c.media_id),
        |dh AS (
        |  SELECT a.media_id,
        |         SUM(CASE WHEN a.cell < b.cell
        |                  THEN CAST(1 AS HUGEINT)
        |                       << CAST((a.i // 8) * 7 + (a.i % 8) AS INTEGER)
        |                  ELSE CAST(0 AS HUGEINT) END) AS ud
        |  FROM cells a JOIN cells b
        |    ON a.media_id = b.media_id AND b.i = a.i + 1 AND (a.i % 8) < 7
        |  GROUP BY a.media_id)
        |SELECT ah.media_id, 16 AS width, 16 AS height,
        |  CAST(ua - CASE WHEN ua >= 9223372036854775808
        |                 THEN 18446744073709551616
        |                 ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS ahash,
        |  CAST(ud AS BIGINT) AS dhash
        |FROM ah JOIN dh ON ah.media_id = dh.media_id
        |ORDER BY ah.media_id""".stripMargin)),
    QueryDef("d5e_resize", multimodalResize, Some(
      // original dims via the d5c emulation; the area-ratio truncation
      // chain is exact-int→double products and correctly-rounded
      // divisions, so floor() reproduces Scala's .toInt exactly; the
      // outer least(byte_len, ·) mirrors Array.take's clamp (an empty
      // payload takes 0 bytes even though the formula floor is 1)
      """WITH b AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |    list_transform(split(substr(text, 1, 256), ''),
        |                   c -> CAST(unicode(c) AS HUGEINT)) AS bs
        |  FROM documents),
        |h AS (
        |  SELECT media_id, byte_len,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), bs),
        |      (acc, c) -> (acc * 31 + c) % 18446744073709551616) AS h64
        |  FROM b),
        |m AS (
        |  SELECT media_id, byte_len,
        |    (16 + ((((h64 - CASE WHEN h64 >= 9223372036854775808
        |                         THEN 18446744073709551616
        |                         ELSE CAST(0 AS HUGEINT) END)
        |             % 240) + 240) % 240)) AS ow,
        |    (16 + (h64 // 256) % 240) AS oh
        |  FROM h)
        |SELECT media_id, 'text/plain' AS media_type,
        |  CAST(least(byte_len, greatest(1, floor(CAST(byte_len AS DOUBLE) *
        |    least(CAST(1.0 AS DOUBLE),
        |          (64.0 * 64.0) / (CAST(ow AS DOUBLE) * CAST(oh AS DOUBLE))))))
        |    AS INTEGER) AS new_byte_len,
        |  64 AS width, 64 AS height
        |FROM m ORDER BY media_id""".stripMargin)),
    QueryDef("d5g_jpeg_roundtrip", jpegRoundTripQ, Some(
      // lossy-codec self-validation (d3e pattern): the Spark side
      // encodes/decodes real JPEG and reduces the comparison against
      // the lossless PNG truth to verdict booleans; the oracle asserts
      // the verdicts hold for every image — DuckDB cannot decode JPEG,
      // and raw lossy bytes are codec-version facts, not engine facts
      """SELECT doc_id AS media_id, 32 AS width, 32 AS height,
        |  true AS dims_ok, true AS deterministic, true AS cell_err_ok,
        |  true AS ahash_ok, true AS dhash_ok
        |FROM documents ORDER BY media_id""".stripMargin)),
    QueryDef("d5h_audio_features", audioFeaturesQ, Some(
      // exact-integer recomputation of the REAL WAV round-trip: the
      // sample formula (floorMod via the double-mod idiom), then pure
      // integer aggregates — peak |s|, sign-flip count via lag, Σ s².
      // PCM-in-WAV losslessness is what makes this oracle legal: the
      // Spark side must parse back the exact samples the formula wrote.
      """WITH s AS (
        |  SELECT d.doc_id AS media_id, g.n,
        |         ((d.doc_id*7919 + g.n*104729 + g.n*g.n*31) % 65536
        |          + 65536) % 65536 - 32768 AS v
        |  FROM documents d, generate_series(0, 1999) g(n)),
        |f AS (
        |  SELECT media_id, n, v,
        |         lag(v) OVER (PARTITION BY media_id ORDER BY n) AS pv
        |  FROM s)
        |SELECT media_id,
        |  8000 AS sample_rate,
        |  2000 AS n_samples,
        |  CAST(2000 * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs,
        |  CAST(SUM(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0))
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |  CAST(SUM(v*v) AS BIGINT) AS energy
        |FROM f GROUP BY media_id ORDER BY media_id""".stripMargin)),
    QueryDef("d5i_video_meta", videoMetaQ, Some(
      // exact recomputation of the REAL ISO-BMFF round-trip from the
      // synthFields formulas — doc_id is non-negative so plain % is
      // floorMod; n_boxes = the six boxes the writer emits (ftyp, moov,
      // mvhd, trak, tkhd, mdat), pinning that the walker visits every
      // node of the tree it was handed.
      """SELECT doc_id AS media_id,
        |  'isom' AS major_brand,
        |  CAST(600 + (doc_id*7) % 400 AS INTEGER) AS timescale,
        |  CAST((doc_id*9973) % 100000 AS BIGINT) AS duration,
        |  CAST(((doc_id*9973) % 100000) * 1000
        |       // (600 + (doc_id*7) % 400) AS BIGINT) AS duration_ms,
        |  CAST(1 AS BIGINT) AS track_id,
        |  CAST(160 + ((doc_id*3) % 32) * 8 AS INTEGER) AS width,
        |  CAST(96 + ((doc_id*5) % 24) * 8 AS INTEGER) AS height,
        |  CAST(doc_id % 17 AS BIGINT) AS mdat_bytes,
        |  6 AS n_boxes
        |FROM documents ORDER BY media_id""".stripMargin)),
    QueryDef("d10_salted_agg", saltedAggQ, Some(
      s"""SELECT event_type, COUNT(*) AS n, ${graft.core.Det.dsumSql("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    QueryDef("d24_salted_join", saltedJoinQ, Some(
      s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         |       ${graft.core.Det.dsumSql("value")} AS sum_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    QueryDef("d6_hash_sample", hashSampleQ, Some(
      // threshold derives from the same hexThreshold formula as the
      // Spark predicate (0.30 → 0x4ccccccc)
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |      < '${Curation.hexThreshold(0.30)}'
         |ORDER BY doc_id""".stripMargin)),
    QueryDef("d6b_stratified_sample", stratifiedSampleQ, Some(
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin)),
    QueryDef("d9_contamination", contaminationQ, Some(
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 5 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 4),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 25),
        |c AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 25)
        |SELECT doc_id, COUNT(DISTINCT g) AS n_overlap
        |FROM c JOIN b USING (g)
        |GROUP BY doc_id HAVING COUNT(DISTINCT g) >= 3
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("d9b_contamination_bloom", contaminationBloomQ, Some(
      // the exact path IS the oracle: Bloom pass ⊇ exact matches and the
      // trailing exact join removes false positives, so any divergence
      // here would be a (impossible-by-construction) false negative
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 5 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 4),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 25),
        |c AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 25)
        |SELECT doc_id, COUNT(DISTINCT g) AS n_overlap
        |FROM c JOIN b USING (g)
        |GROUP BY doc_id HAVING COUNT(DISTINCT g) >= 3
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("d11_corpus_shuffle", corpusShuffleQ, Some(
      """SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key, source
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin)),
    QueryDef("d12_split_assign", splitAssignQ, Some(
      // thresholds derive from the same hexThreshold formula the Spark
      // side uses — cumulative fractions 0.8 and 0.9
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |            < '${Curation.hexThreshold(0.8)}' THEN 'train'
         |       WHEN substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |            < '${Curation.hexThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("d8_dataset_mix", datasetMixQ, Some(
      """SELECT doc_id, source,
        |       CAST(unnest(generate_series(0, coalesce(n, 1) - 1)) AS INTEGER) AS epoch
        |FROM documents
        |LEFT JOIN (VALUES ('src0', 3), ('src1', 2)) w(source, n) USING (source)
        |ORDER BY doc_id, epoch""".stripMargin)),
    QueryDef("d7_token_packing", tokenPackingQ, Some(
      """SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT))
        |    OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
        |  CAST(floor(CAST(coalesce(sum(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT))
        |    OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 2048.0) AS BIGINT) AS bin
        |FROM documents ORDER BY lang, doc_id""".stripMargin)),
    QueryDef("d13_boilerplate_ngrams", boilerplateQ, Some(
      // same tokenizer/shingle formulation as the d9 oracle, k=3;
      // grams are distinct per doc so count(*) counts documents
      """WITH gs AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 2),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |g AS (SELECT doc_id, unnest(s) AS g FROM gs),
        |b AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
        |       FROM g JOIN b USING (g) GROUP BY doc_id)
        |SELECT gs.doc_id, CAST(len(s) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler,
        |  CAST(coalesce(n_boiler, 0) AS DOUBLE)
        |    / CAST(greatest(len(s), 1) AS DOUBLE) AS boiler_frac
        |FROM gs LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin)),
    QueryDef("d14_tfidf_topk", tfidfQ, Some(
      // score = CAST(tf*N AS DOUBLE)/df: one correctly-rounded IEEE
      // division from integral operands — bit-identical cross-engine
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |        FROM tok GROUP BY term),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, term, tf, doc_freq,
        |    CAST(tf * n_docs AS DOUBLE) / CAST(doc_freq AS DOUBLE) AS score
        |  FROM tf JOIN dft USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, doc_freq, score,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |         ORDER BY score DESC, term) AS INTEGER) AS rnk
        |FROM s
        |QUALIFY rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin)),
    QueryDef("d15_zorder_key", zorderQ, Some(
      // the interleave terms are GENERATED from the same unrolled
      // formula the Spark column uses (Layout.zValue2Sql), so both
      // engines evaluate the identical shift/mask chain; scaling is
      // integer multiply-then-integer-divide, clamped first
      s"""WITH s AS (
         |  SELECT event_id,
         |    (greatest(least(user_id, 2047), 0) * 65536) // 2048 AS a,
         |    ((greatest(least(epoch_ns(ts) // 1000, 1706745599999999),
         |               1704067200000000) - 1704067200000000) * 65536)
         |      // 2678400000000 AS b
         |  FROM events)
         |SELECT event_id,
         |  CAST(${graft.operators.Layout.zValue2Sql("a", "b", 16)} AS BIGINT) AS zval
         |FROM s ORDER BY zval, event_id""".stripMargin)),
    QueryDef("d15b_zorder3", zorder3Q, Some(
      // three dims through the same generated interleave (zValueNSql);
      // scaling mirrors Layout.scaleToBits term for term
      s"""WITH s AS (
         |  SELECT event_id,
         |    (greatest(least(user_id, 2047), 0) * 65536) // 2048 AS a,
         |    ((greatest(least(epoch_ns(ts) // 1000, 1706745599999999),
         |               1704067200000000) - 1704067200000000) * 65536)
         |      // 2678400000000 AS b,
         |    (greatest(least(unicode(event_type), 127), 0) * 65536) // 128 AS c
         |  FROM events)
         |SELECT event_id,
         |  CAST(${graft.operators.Layout.zValueNSql(Seq("a", "b", "c"), 16)} AS BIGINT) AS zval
         |FROM s ORDER BY zval, event_id""".stripMargin)),
    QueryDef("d16_cross_source_dup", crossSourceDupQ, Some(
      // pair generation is the d2 oracle verbatim (brute-force exact
      // Jaccard >= τ; recall-1.0 argument at minhashNearDup), then a
      // source-label join and a Det-exact aggregate
      s"""WITH d AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
         |    ELSE list_transform(generate_series(1, len(w) - 2),
         |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sh
         |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         |        FROM documents)),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         len(list_intersect(a.sh, b.sh)) AS inter,
         |         len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id),
         |v AS (
         |  SELECT id_a, id_b, CAST(inter AS DOUBLE)/CAST(uni AS DOUBLE) AS jaccard
         |  FROM pairs
         |  WHERE uni > 0 AND CAST(inter AS DOUBLE)/CAST(uni AS DOUBLE) >= 0.5)
         |SELECT da.source AS source_a, db.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  ${graft.core.Det.dsumSql("jaccard")} AS sum_jaccard
         |FROM v
         |JOIN documents da ON v.id_a = da.doc_id
         |JOIN documents db ON v.id_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("d17_cms_heavy_hitters", cmsHeavyHittersQ, Some(
      // full sketch replication: the same portable hash pair as the
      // simhash oracle (two char folds), KM cells (h1 + d*h2) mod 64,
      // counter build from per-term counts, min-over-rows probe
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
        |        FROM tok GROUP BY term),
        |h AS (
        |  SELECT term, exact_cnt,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(split(term, ''), c -> CAST(unicode(c) AS BIGINT))),
        |      (a, c) -> (a * 131 + c) % 2147483647) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(split(term, ''), c -> CAST(unicode(c) AS BIGINT))),
        |      (a, c) -> (a * 137 + c) % 2147483629) AS h2
        |  FROM cnt),
        |cells AS (
        |  SELECT term, exact_cnt, d, (h1 + d * h2) % 64 AS bucket
        |  FROM h, generate_series(0, 3) g(d)),
        |sketch AS (
        |  SELECT d, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cnt
        |  FROM cells GROUP BY d, bucket),
        |est AS (
        |  SELECT c.term, min(s.cnt) AS cms_est
        |  FROM cells c JOIN sketch s USING (d, bucket) GROUP BY c.term)
        |SELECT h.term, exact_cnt, cms_est, cms_est >= exact_cnt AS is_upper_bound
        |FROM h JOIN est ON h.term = est.term
        |ORDER BY exact_cnt DESC, h.term LIMIT 20""".stripMargin)),
    QueryDef("d18_equidepth_hist", equiDepthQ, Some(
      // quantile_cont ≡ Spark percentile (linear interpolation at
      // p*(n-1), q25 precedent) — over INTEGER cents with dyadic
      // fractions the interpolation is FP-exact, so the two engines'
      // different formula orders cannot diverge (they did by 1 ulp on
      // raw doubles); ties at a boundary land in the lower bucket
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS value_cents FROM events),
        |b AS (
        |  SELECT [quantile_cont(value_cents, 0.125), quantile_cont(value_cents, 0.25),
        |          quantile_cont(value_cents, 0.375), quantile_cont(value_cents, 0.5),
        |          quantile_cont(value_cents, 0.625), quantile_cont(value_cents, 0.75),
        |          quantile_cont(value_cents, 0.875)] AS bounds
        |  FROM e)
        |SELECT CAST(len(list_filter(bounds, x -> x < value_cents)) AS INTEGER) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       MIN(value_cents) AS lo, MAX(value_cents) AS hi
        |FROM e, b GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("d27_setsim_join", setSimJoinQ, Some(
      // brute-force all-pairs oracle — valid BECAUSE the prefix filter
      // has recall exactly 1 (d9b pattern: lossless pre-filters keep
      // the exact path's SQL a true oracle); same shingle build as d2c
      """WITH d AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        |    ELSE list_transform(generate_series(1, len(w) - 2),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents)),
        |d2 AS (SELECT doc_id, sh FROM d WHERE len(sh) > 0),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         len(list_intersect(a.sh, b.sh)) AS inter,
        |         len(a.sh) AS n_a, len(b.sh) AS n_b
        |  FROM d2 a JOIN d2 b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |       CAST(n_a AS INTEGER) AS n_a, CAST(n_b AS INTEGER) AS n_b,
        |       round(CAST(inter AS DOUBLE)
        |             / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
        |FROM p
        |WHERE inter * 2 >= n_a + n_b - inter
        |ORDER BY id_a, id_b""".stripMargin)),
    QueryDef("d26_anomaly_zscore", anomalyQ, Some(
      // the squared, denominator-cleared z-test in integer arithmetic:
      // (n-1)(n·xi − S1)² > z²·n·(n·S2 − S1²); DuckDB's HUGEINT window
      // sums are cast back to BIGINT to mirror Spark's Long
      """WITH x AS (
        |  SELECT event_type, event_id, ts, value,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS xi
        |  FROM events),
        |w AS (
        |  SELECT event_type, event_id, ts, value, xi,
        |         CAST(sum(xi) OVER win AS BIGINT) AS s1,
        |         CAST(sum(xi * xi) OVER win AS BIGINT) AS s2,
        |         count(*) OVER win AS n
        |  FROM x
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, ts, value
        |FROM w
        |WHERE n = 20
        |  AND 19 * (20 * xi - s1) * (20 * xi - s1)
        |      > 9 * 20 * (20 * s2 - s1 * s1)
        |ORDER BY event_id""".stripMargin)),
    QueryDef("d4g_fuzzy_match", fuzzyMatchQ, Some(
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 40) AS title FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS INTEGER) AS edit_dist,
        |  1.0 - CAST(levenshtein(a.title, b.title) AS DOUBLE)
        |      / CAST(greatest(len(a.title), len(b.title)) AS DOUBLE) AS sim
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin)),
    QueryDef("d18b_equidepth_by_group", equiDepthByQ, Some(
      """WITH ec AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |         [quantile_cont(value_cents, 0.25), quantile_cont(value_cents, 0.5),
        |          quantile_cont(value_cents, 0.75)] AS bounds
        |  FROM ec GROUP BY event_type)
        |SELECT e.event_type,
        |       CAST(len(list_filter(bounds, x -> x < value_cents)) AS INTEGER) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       MIN(value_cents) AS lo, MAX(value_cents) AS hi
        |FROM ec e JOIN b ON e.event_type = b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("d19b_bucket_cms_keycount", bucketCmsKeyCountQ, Some(
      // full replication (d17 pattern): same portable hash pair, KM
      // cells (h1 + d*h2) mod 1024, counters summed from per-key
      // counts (bucket-split then merged ≡ global by additivity)
      """WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
        |cnt AS (SELECT key, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY key),
        |h AS (
        |  SELECT key, n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(split(key, ''), c -> CAST(unicode(c) AS BIGINT))),
        |      (a, c) -> (a * 131 + c) % 2147483647) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(split(key, ''), c -> CAST(unicode(c) AS BIGINT))),
        |      (a, c) -> (a * 137 + c) % 2147483629) AS h2
        |  FROM cnt),
        |cells AS (
        |  SELECT key, n, d, (h1 + d * h2) % 1024 AS bucket
        |  FROM h, generate_series(0, 3) g(d)),
        |sketch AS (
        |  SELECT d, bucket, CAST(sum(n) AS BIGINT) AS cnt
        |  FROM cells GROUP BY d, bucket),
        |est AS (
        |  SELECT c.key, min(s.cnt) AS cms_est
        |  FROM cells c JOIN sketch s USING (d, bucket) GROUP BY c.key)
        |SELECT h.key, h.n AS n_exact, est.cms_est,
        |       est.cms_est >= h.n AS is_upper_bound
        |FROM h JOIN est ON h.key = est.key
        |WHERE CAST(h.key AS BIGINT) < 20
        |ORDER BY h.key""".stripMargin)),
    QueryDef("d20_colstats_estimate", colStatsEstimateQ, Some(
      // exact per-range anchors in SQL; the estimate verdicts (aligned
      // ranges exactly equal, unaligned within the straddling-cell
      // bound) are validated in-query — interpolated boundaries at
      // epoch-µs magnitude are not bit-replicable cross-engine, the
      // verdicts are
      """WITH p(range_id, qlo, qhi) AS (VALUES
        | (1, epoch_us(TIMESTAMP '2024-01-05 00:00:00'),
        |     epoch_us(TIMESTAMP '2024-01-11 23:59:59.999999')),
        | (2, epoch_us(TIMESTAMP '2024-01-01 00:00:00'),
        |     epoch_us(TIMESTAMP '2024-01-31 23:59:59.999999')),
        | (3, epoch_us(TIMESTAMP '2024-01-03 07:20:00'),
        |     epoch_us(TIMESTAMP '2024-01-17 18:40:00')),
        | (4, epoch_us(TIMESTAMP '2024-01-10 12:34:56.789012'),
        |     epoch_us(TIMESTAMP '2024-01-12 01:23:45.678901')))
        |SELECT CAST(p.range_id AS BIGINT) AS range_id,
        |       CAST(count(e.ts) AS BIGINT) AS n_exact,
        |       TRUE AS aligned_exact, TRUE AS bound_ok
        |FROM p LEFT JOIN events e
        |  ON epoch_ns(e.ts) // 1000 BETWEEN p.qlo AND p.qhi
        |GROUP BY p.range_id ORDER BY range_id""".stripMargin)),
    QueryDef("d21_key_lookup", keyLookupQ, Some(
      // the lookup result is hash-exact (the sidecar path must return
      // precisely what a full scan would); the pruning claim is the
      // in-query prune_ok verdict — file-count metrics have no SQL twin
      """WITH p AS (
        |  SELECT min(user_id) AS lo, max(user_id) AS hi FROM events)
        |SELECT CAST(e.user_id AS VARCHAR) AS key, e.ts, e.event_type,
        |       TRUE AS prune_ok
        |FROM events e, p WHERE e.user_id IN (p.lo, p.hi)
        |ORDER BY key, e.ts, e.event_type""".stripMargin)),
    QueryDef("d21b_key_range_scan", keyRangeScanQ, Some(
      // the [d05/, d05/￿] binary interval over day-prefixed keys
      // selects exactly day 05 — the oracle states it as the day
      // filter; the pruning claim is the in-query prune_ok verdict
      """SELECT 'd' || strftime(ts, '%d') || '/u' ||
        |         CAST(user_id AS VARCHAR) AS key,
        |       ts, event_type, TRUE AS prune_ok
        |FROM events
        |WHERE strftime(ts, '%d') = '05'
        |ORDER BY key, ts, event_type""".stripMargin)),
    QueryDef("d22_doc_chunks", docChunksQ, Some(
      """WITH d AS (
        |  SELECT doc_id, text,
        |    greatest(CAST(1 AS BIGINT),
        |             (length(text) - 50 + 149) // 150) AS n_chunks
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, text, n_chunks,
        |         unnest(range(0, n_chunks)) AS i
        |  FROM d)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
        |       substring(text, CAST(i * 150 + 1 AS INTEGER), 200) AS chunk,
        |       CAST(n_chunks AS BIGINT) AS n_chunks
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin)),
    QueryDef("d28_hybrid_rrf", hybridRrfQ, Some(
      // both rank lists fully replicated (BM25 = d23's rational-idf
      // SQL at k=50; cosine = d3's ordered-fold SQL for the single
      // query vec_id 0), then RRF: per-list 1/(60+rank) — one exact
      // integer division each — summed text-then-vec (the builder's
      // fixed fold order)
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
        |              CAST(sum(dl) AS DOUBLE)
        |                / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl
        |       FROM dl),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('hash', 'join', 'merge', 'stream') GROUP BY 1, 2),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    (CAST(2 * n_docs - 2 * doc_freq + 1 AS DOUBLE)
        |       / CAST(2 * doc_freq + 1 AS DOUBLE))
        |    * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        |       / (CAST(tf AS DOUBLE)
        |          + CAST(1.2 AS DOUBLE)
        |            * (CAST(0.25 AS DOUBLE)
        |               + CAST(0.75 AS DOUBLE)
        |                 * (CAST(dl AS DOUBLE) / avgdl)))) AS tscore
        |  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |txt AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
        |           AS rank_text
        |  FROM (SELECT doc_id,
        |               list_reduce(list(tscore ORDER BY term), (a, x) -> a + x) AS score
        |        FROM s GROUP BY 1)
        |  QUALIFY rank_text <= 50),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |vp AS (
        |  SELECT e.vec_id AS doc_id,
        |    list_reduce(list_transform(list_zip(q.qe, e.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a,b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(q.qe,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))
        |     * sqrt(list_reduce(list_transform(e.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b))) AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> 0),
        |vec AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INTEGER)
        |           AS rank_vec
        |  FROM vp QUALIFY rank_vec <= 50),
        |f AS (
        |  SELECT coalesce(txt.doc_id, vec.doc_id) AS doc_id, rank_text, rank_vec,
        |    (CASE WHEN rank_text IS NOT NULL
        |          THEN CAST(1 AS DOUBLE) / CAST(60 + rank_text AS DOUBLE)
        |          ELSE CAST(0 AS DOUBLE) END)
        |    + (CASE WHEN rank_vec IS NOT NULL
        |            THEN CAST(1 AS DOUBLE) / CAST(60 + rank_vec AS DOUBLE)
        |            ELSE CAST(0 AS DOUBLE) END) AS rrf_score
        |  FROM txt FULL JOIN vec ON txt.doc_id = vec.doc_id)
        |SELECT doc_id, rank_text, rank_vec, rrf_score,
        |       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INTEGER)
        |         AS fused_rank
        |FROM f QUALIFY fused_rank <= 20 ORDER BY fused_rank""".stripMargin)),
    QueryDef("d29_drift_report", driftQ, Some(
      // exact per-bin counts; chi² = ordered bin-ascending fold of
      // identical elementary-IEEE terms; PSI (ln-based) appears ONLY
      // as the thresholded verdict — smoothing constant (m+1)/2 = 3.0
      """WITH d AS (
        |  SELECT CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 2 AS par,
        |         n_chars FROM documents WHERE n_chars IS NOT NULL),
        |ba AS (SELECT CAST(len(list_filter([100, 200, 300, 400, 500],
        |                bd -> bd <= n_chars)) AS INTEGER) AS bin_id,
        |              CAST(count(*) AS BIGINT) AS n_a
        |       FROM d WHERE par = 0 GROUP BY 1),
        |bb AS (SELECT CAST(len(list_filter([100, 200, 300, 400, 500],
        |                bd -> bd <= n_chars)) AS INTEGER) AS bin_id,
        |              CAST(count(*) AS BIGINT) AS n_b
        |       FROM d WHERE par = 1 GROUP BY 1),
        |j AS (SELECT coalesce(ba.bin_id, bb.bin_id) AS bin_id,
        |             CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
        |             CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
        |      FROM ba FULL JOIN bb ON ba.bin_id = bb.bin_id),
        |tot AS (SELECT CAST(sum(n_a) AS DOUBLE) AS ta,
        |               CAST(sum(n_b) AS DOUBLE) AS tb FROM j),
        |terms AS (
        |  SELECT bin_id,
        |    CASE WHEN n_a + n_b = 0 THEN CAST(0 AS DOUBLE)
        |         ELSE (CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
        |            * (CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
        |            / (CAST(n_a AS DOUBLE) / ta + CAST(n_b AS DOUBLE) / tb)
        |    END AS chi_term,
        |    ((CAST(n_a AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |       / (ta + CAST(3.0 AS DOUBLE))
        |     - (CAST(n_b AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |       / (tb + CAST(3.0 AS DOUBLE)))
        |    * ln(((CAST(n_a AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |            / (ta + CAST(3.0 AS DOUBLE)))
        |         / ((CAST(n_b AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |            / (tb + CAST(3.0 AS DOUBLE)))) AS psi_term
        |  FROM j CROSS JOIN tot),
        |g AS (SELECT list_reduce(list(chi_term ORDER BY bin_id), (a, x) -> a + x) AS chi2,
        |             list_reduce(list(psi_term ORDER BY bin_id), (a, x) -> a + x)
        |               > CAST(0.2 AS DOUBLE) AS psi_drifted
        |      FROM terms)
        |SELECT bin_id, n_a, n_b, chi2, psi_drifted
        |FROM j CROSS JOIN g ORDER BY bin_id""".stripMargin)),
    QueryDef("d25_rollup_range", rollupRangeQ, Some(
      // the oracle recomputes the hourly slots from raw events: slot =
      // hour-floored epoch µs, v = user_id where event_type <> 'view'
      // (the sidecar's null path), every aggregate exact BIGINT; range
      // = slots INTERSECTING [2024-01-05, 2024-01-20 12:30] — start
      // floored to its slot, end compared raw (slot granularity, the
      // rollupRange contract)
      """WITH v AS (
        |  SELECT ts, CASE WHEN event_type <> 'view' THEN user_id END AS v
        |  FROM events),
        |r AS (
        |  SELECT (epoch_ns(ts) // 1000 // 3600000000) * 3600000000 AS slot_us,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(v) AS BIGINT) AS nv,
        |         CAST(coalesce(sum(v), 0) AS BIGINT) AS sum,
        |         CAST(min(v) AS BIGINT) AS vmin,
        |         CAST(max(v) AS BIGINT) AS vmax
        |  FROM v GROUP BY 1)
        |SELECT make_timestamp(slot_us) AS slot_start, n, nv, sum, vmin, vmax
        |FROM r
        |WHERE slot_us >= (1704412800000000 // 3600000000) * 3600000000
        |  AND slot_us <= 1705753800000000
        |ORDER BY slot_start""".stripMargin)),
    QueryDef("d43_rollup_asof", rollupAsOfQ, Some(
      // identical oracle to d25 — the AS-OF read must reproduce the
      // PRE-DELETE aggregate exactly; the divergence claim is the
      // in-query verdict pinned TRUE
      """WITH v AS (
        |  SELECT ts, CASE WHEN event_type <> 'view' THEN user_id END AS v
        |  FROM events),
        |r AS (
        |  SELECT (epoch_ns(ts) // 1000 // 3600000000) * 3600000000 AS slot_us,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(v) AS BIGINT) AS nv,
        |         CAST(coalesce(sum(v), 0) AS BIGINT) AS sum,
        |         CAST(min(v) AS BIGINT) AS vmin,
        |         CAST(max(v) AS BIGINT) AS vmax
        |  FROM v GROUP BY 1)
        |SELECT make_timestamp(slot_us) AS slot_start, n, nv, sum, vmin, vmax,
        |       TRUE AS snapshot_differs_from_live
        |FROM r
        |WHERE slot_us >= (1704412800000000 // 3600000000) * 3600000000
        |  AND slot_us <= 1705753800000000
        |ORDER BY slot_start""".stripMargin)),
    QueryDef("d46_key_asof", keyAsOfQ, Some(
      // the AS-OF key lookup must reproduce the key's PRE-DELETE rows
      // exactly; the live-divergence claim is the in-query verdict
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       TRUE AS snapshot_differs_from_live
        |FROM events
        |WHERE user_id = (SELECT min(user_id) FROM events)
        |ORDER BY ts, event_type""".stripMargin)),
    QueryDef("d31_weighted_sample", weightedSampleQ, Some(
      // identical draw (first 8 md5 hex chars) and identical per-row
      // threshold arithmetic: floor((r/10)·2^32) as 8 lowercase hex
      // digits; max rate is 0.5 so the keep-all branch never fires
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 5 + 1 AS r
        |  FROM documents)
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      < printf('%08x',
        |          CAST(floor((CAST(r AS DOUBLE) / CAST(10 AS DOUBLE))
        |                     * 4294967296.0) AS BIGINT))
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("d32_negative_pairs", negativePairsQ, Some(
      // identical seeded draw md5('7:'||id), identical bucket (first
      // hex byte) and in-bucket order (hash, id), identical no-wrap
      // lead semantics
      """WITH h AS (
        |  SELECT doc_id AS id_a,
        |         md5('7:' || CAST(doc_id AS VARCHAR)) AS hh
        |  FROM documents),
        |o AS (SELECT id_a, hh, substring(hh, 1, 2) AS b FROM h),
        |l AS (SELECT id_a,
        |        lead(id_a, 1) OVER (PARTITION BY b ORDER BY hh, id_a) AS n1,
        |        lead(id_a, 2) OVER (PARTITION BY b ORDER BY hh, id_a) AS n2
        |      FROM o)
        |SELECT id_a, id_b FROM (
        |  SELECT id_a, n1 AS id_b FROM l
        |  UNION ALL
        |  SELECT id_a, n2 AS id_b FROM l)
        |WHERE id_b IS NOT NULL
        |ORDER BY id_a, id_b""".stripMargin)),
    QueryDef("d33_semantic_dedup", semanticDedupQ,
      Some(semanticDedupOracle)),
    QueryDef("d33f_semantic_dedup_twolevel", semanticDedupTwoLevelQ,
      // EXHAUSTIVE probe (nprobe = ncoarse) makes the two-level
      // assignment equal the flat argmax, so the d33 oracle applies
      // VERBATIM — the hash compare covers the two-level machinery
      Some(semanticDedupOracle)),
    QueryDef("d33e_semantic_dedup_fitted", semanticDedupFittedQ, Some(
      // self-validating (d3e pattern): exact anchor = corpus count; the
      // keeper-bound, dupfree-postcondition and co-location-recall
      // verdicts are computed in-query and must come out TRUE — see
      // semanticDedupFittedQ's threshold margins
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs, 16 AS nlist,
        |       TRUE AS keepers_ok, TRUE AS dupfree_ok,
        |       TRUE AS pair_recall_ok
        |FROM embeddings""".stripMargin)),
    QueryDef("d33g_semantic_dedup_fitted_twolevel",
      semanticDedupFittedTwoLevelQ, Some(
      // self-validating (d33e pattern): exact anchor = corpus count;
      // assign_ok (exhaustive two-level ≡ flat argmax over the same
      // fitted codebook), keeper-bound and dup-free-postcondition
      // verdicts are computed in-query and must come out TRUE
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs, 16 AS nlist,
        |       4 AS ncoarse, TRUE AS assign_ok, TRUE AS keepers_ok,
        |       TRUE AS dupfree_ok
        |FROM embeddings""".stripMargin)),
    QueryDef("d38_bucketed_join", bucketedJoinQ, Some(
      // the co-located join must answer exactly what the plain join
      // answers — the oracle replays split/join/agg over raw events
      """WITH a AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_type AS et
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_type AS et
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
        |SELECT a.key, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(count(CASE WHEN a.et = b.et THEN 1 END) AS BIGINT)
        |         AS n_same
        |FROM a JOIN b ON a.key = b.key
        |GROUP BY a.key
        |ORDER BY a.key""".stripMargin)),
    QueryDef("d33h_semantic_dedup_adaptive", semanticDedupAdaptiveQ, Some(
      // self-validating (d33e pattern): exact anchor = corpus count;
      // escalation, sampled+full agreement floors, keeper bound and the
      // greedy dup-free postcondition are in-query verdicts that must
      // all come out TRUE (deterministic on this fixture — see builder)
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs, 16 AS nlist,
        |       4 AS ncoarse, TRUE AS escalated_ok, TRUE AS agreement_ok,
        |       TRUE AS assign_floor_ok, TRUE AS keepers_ok,
        |       TRUE AS dupfree_ok
        |FROM embeddings""".stripMargin)),
    QueryDef("d39_bucketed_autoroute", bucketedAutoRouteQ, Some(
      // d38's oracle (the auto-routed plan must answer exactly what the
      // plain join answers); the zero-exchange claim is the in-query
      // auto_routed verdict — plan metrics have no SQL twin
      """WITH a AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_type AS et
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_type AS et
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
        |SELECT a.key, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(count(CASE WHEN a.et = b.et THEN 1 END) AS BIGINT)
        |         AS n_same,
        |       TRUE AS auto_routed
        |FROM a JOIN b ON a.key = b.key
        |GROUP BY a.key
        |ORDER BY a.key""".stripMargin)),
    QueryDef("d37_selfdedup", substringSelfDedupQ, Some(
      // d35's oracle shape with the dup rule turned inward: a window is
      // dup iff the same gram started EARLIER in the same doc
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |wn AS (
        |  SELECT doc_id, i, array_to_string(toks[i:i+5], ' ') AS g
        |  FROM t, unnest(generate_series(1, len(toks) - 5)) AS u(i)),
        |fi AS (SELECT doc_id, g, min(i) AS first_i
        |       FROM wn GROUP BY doc_id, g),
        |cov AS (SELECT DISTINCT wn.doc_id, p
        |        FROM wn JOIN fi USING (doc_id, g),
        |             unnest(generate_series(i, i + 5)) AS v(p)
        |        WHERE wn.i > fi.first_i),
        |cd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |       FROM cov GROUP BY doc_id),
        |tp AS (SELECT doc_id, p, toks[p] AS tok
        |       FROM t, unnest(generate_series(1, len(toks))) AS u(p)),
        |keep AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
        |         ANTI JOIN cov USING (doc_id, p)),
        |cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
        |       FROM keep GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(cd.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(cl.clean_text, '') AS clean_text
        |FROM t LEFT JOIN cd USING (doc_id) LEFT JOIN cl USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin)),
    QueryDef("d35_substring_dedup", substringDedupQ, Some(
      // same tokenizer as every text oracle; grams are exact strings
      // (collision-free), cover = union of [i, i+7] for dup windows,
      // reconstruction = surviving tokens in position order
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |wn AS (
        |  SELECT doc_id, i, array_to_string(toks[i:i+7], ' ') AS g
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)),
        |dg AS (SELECT g FROM wn GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, p
        |        FROM wn JOIN dg USING (g),
        |             unnest(generate_series(i, i + 7)) AS v(p)),
        |cd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |       FROM cov GROUP BY doc_id),
        |tp AS (SELECT doc_id, p, toks[p] AS tok
        |       FROM t, unnest(generate_series(1, len(toks))) AS u(p)),
        |keep AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
        |         ANTI JOIN cov USING (doc_id, p)),
        |cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
        |       FROM keep GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(cd.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(cl.clean_text, '') AS clean_text
        |FROM t LEFT JOIN cd USING (doc_id) LEFT JOIN cl USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin)),
    QueryDef("d35b_substring_dedup_hashed", substringDedupHashedQ, Some(
      // the hashed-gram PRODUCTION DEFAULT, self-validating: the oracle
      // replicates the exact recipe (identical to d35's CTE chain) and
      // asserts the in-query equality verdicts — a hash match proves the
      // shipped default ≡ exact on this corpus (no 64-bit collisions)
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |wn AS (
        |  SELECT doc_id, i, array_to_string(toks[i:i+7], ' ') AS g
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)),
        |dg AS (SELECT g FROM wn GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, p
        |        FROM wn JOIN dg USING (g),
        |             unnest(generate_series(i, i + 7)) AS v(p)),
        |cd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |       FROM cov GROUP BY doc_id),
        |tp AS (SELECT doc_id, p, toks[p] AS tok
        |       FROM t, unnest(generate_series(1, len(toks))) AS u(p)),
        |keep AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
        |         ANTI JOIN cov USING (doc_id, p)),
        |cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
        |       FROM keep GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(cd.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(cl.clean_text, '') AS clean_text,
        |       TRUE AS matches_exact
        |FROM t LEFT JOIN cd USING (doc_id) LEFT JOIN cl USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin)),
    QueryDef("d34_quality_classifier", qualityClassifierQ, Some(
      // same tokenization, same 256-bucket md5 feature hash (first two
      // hex chars), same exact-int64 bucket→weight map, same left-fold
      // mean — scores compare unrounded
      """SELECT doc_id, q_score,
        |       CASE WHEN q_score >= 0.0 THEN 1 ELSE 0 END AS kept
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN len(w) = 0 THEN 0.0 ELSE
        |      list_reduce(list_transform(w, t ->
        |        CAST((((strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16
        |               + strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1)
        |              * 2654435761 + 104729) % 2001 AS DOUBLE) / 1000.0 - 1.0),
        |        (a, b) -> a + b) / len(w)
        |    END AS q_score
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("d30_chrono_upsert", chronoUpsertQ, Some(
      // upsert contract in set algebra: rows of keys NOT in the batch
      // survive; every batch key's state is exactly the batch's rows
      """WITH touched AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |keep AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |    AND user_id NOT IN (SELECT user_id FROM touched)),
        |ins AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
        |SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type AS state
        |FROM (SELECT * FROM keep UNION ALL SELECT * FROM ins)
        |ORDER BY key, ts, state""".stripMargin)),
    QueryDef("d25b_rollup_realtime", rollupRealtimeQ, Some(
      // range-exact: the oracle clips rows to the inclusive µs range
      // FIRST, then aggregates hourly — precisely what the sidecar
      // interior + clipped-edge union computes.
      // 2024-01-05 07:42:11.5 = 1704440531500000 µs;
      // 2024-01-20 18:15:00.25 = 1705774500250000 µs
      """WITH v AS (
        |  SELECT ts, CASE WHEN event_type <> 'view' THEN user_id END AS v
        |  FROM events
        |  WHERE epoch_ns(ts) // 1000 BETWEEN 1704440531500000 AND 1705774500250000)
        |SELECT make_timestamp((epoch_ns(ts) // 1000 // 3600000000) * 3600000000)
        |         AS slot_start,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(v) AS BIGINT) AS nv,
        |       CAST(coalesce(sum(v), 0) AS BIGINT) AS sum,
        |       CAST(min(v) AS BIGINT) AS vmin,
        |       CAST(max(v) AS BIGINT) AS vmax
        |FROM v GROUP BY 1 ORDER BY slot_start""".stripMargin)),
    QueryDef("d23_bm25_topk", bm25Q, Some(
      // every constant ::DOUBLE (DuckDB literals are DECIMAL); score =
      // one integral-operand division (idf) × the standard tf norm,
      // identical operand trees to the Spark side; per-doc sum is an
      // ordered term-ascending fold (double + is non-associative)
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
        |              CAST(sum(dl) AS DOUBLE)
        |                / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl
        |       FROM dl),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('hash', 'join', 'merge', 'stream') GROUP BY 1, 2),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    (CAST(2 * n_docs - 2 * doc_freq + 1 AS DOUBLE)
        |       / CAST(2 * doc_freq + 1 AS DOUBLE))
        |    * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        |       / (CAST(tf AS DOUBLE)
        |          + CAST(1.2 AS DOUBLE)
        |            * (CAST(0.25 AS DOUBLE)
        |               + CAST(0.75 AS DOUBLE)
        |                 * (CAST(dl AS DOUBLE) / avgdl)))) AS tscore
        |  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |d AS (SELECT doc_id,
        |             list_reduce(list(tscore ORDER BY term), (a, x) -> a + x) AS score
        |      FROM s GROUP BY 1)
        |SELECT doc_id, score,
        |       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
        |FROM d
        |QUALIFY rnk <= 20
        |ORDER BY rnk""".stripMargin)),
    QueryDef("d19_bucket_sketch_distinct", bucketSketchDistinctQ, Some(
      // exact weekly anchors in SQL; the sketch-merge estimate and its
      // tolerance verdict are validated in-query (q22 pattern) — HLL
      // registers are engine-private, the verdict is not
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       TRUE AS within_tol
        |FROM events GROUP BY week_start ORDER BY week_start""".stripMargin))
  )
}
