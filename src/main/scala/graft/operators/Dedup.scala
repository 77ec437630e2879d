package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication family for the LLM-data-pipeline surface
  * (SURVEY.md §2c D1/D2): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup. All formulations avoid O(n²): candidate
  * generation is always a hash-bucket equi-join (LSH bands / simhash
  * chunks / shared-shingle keys), never a cross join, so they scale to
  * 100 TB corpora where brute-force pairing is impossible.
  */
object Dedup {

  /** D1 — exact dedup by content hash: one hash-partitioned aggregate.
    * Returns one row per distinct content with the smallest id as keeper.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash signature: `numHashes` permutations approximated by
    * xxhash64(shingle, seed_i); minhash_i = min over shingles. Pure
    * column expressions (array fold), codegen'd.
    */
  def minHashSignature(text: Column, shingleK: Int, numHashes: Int): Column = {
    val sh = TextFunctions.shingles(text, shingleK)
    // ONE fold over the shingle array with an array-of-mins accumulator:
    // sig[i] = min over shingles of xxhash64(s, i). Folding per-hash (or
    // transforming per-hash with the fold inside) re-evaluates the
    // shingle/tokenize subtree once per hash — lambdas get no CSE —
    // which measured ~100× slower.
    val idxs = sequence(lit(0), lit(numHashes - 1))
    aggregate(
      sh,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc, idxs, (a, i) => least(a, xxhash64(s, i))))
  }

  /** D2 — MinHash + LSH near-dup candidate pairs, verified with exact
    * shingle-set Jaccard. `bands × rowsPerBand` hashes; a pair is a
    * candidate iff all rows of some band agree (banding amplifies the
    * sim^rows curve). Only candidates pay the exact-Jaccard verify.
    *
    * Output: (id_a < id_b, jaccard) for verified pairs ≥ threshold.
    */
  def minHashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {

    val numHashes = bands * rowsPerBand
    val base = df.select(
      col(idCol).as("id"),
      col(textCol).as("text"),
      minHashSignature(col(textCol), shingleK, numHashes).as("sig"))

    // band key = hash of that band's slice of the signature
    val banded = (0 until bands).map { b =>
      base.select(
        lit(b).as("band"),
        xxhash64(to_json(struct(
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("s")))).as("bucket"),
        col("id"), col("text"))
    }.reduce(_ unionByName _)

    val lhs = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("text").as("text_a"))
    val rhs = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("text").as("text_b"))

    val candidates = lhs.join(rhs, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        shingleJaccard(col("text_a"), col("text_b"), shingleK))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard similarity of two texts' k-shingle sets. */
  def shingleJaccard(a: Column, b: Column, k: Int): Column = {
    val sa = array_distinct(TextFunctions.shingles(a, k))
    val sb = array_distinct(TextFunctions.shingles(b, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** SimHash: 64-bit signature where bit j = sign of the sum over tokens
    * of (+1 / -1 from bit j of xxhash64(token)). Near-dups differ in few
    * bits (Hamming distance).
    */
  def simHash(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val masks = array((0 until 64).map(j => lit(1L << j)): _*)
    // Single pass over tokens with a 64-counter array accumulator; then
    // fold sign bits into the signature. One tokenization, no per-bit
    // expression duplication.
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, masks,
        (a, m) => a + when(xxhash64(t).bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counters, masks, (c, m) => when(c > 0, m).otherwise(0L)),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** D2b — SimHash near-dup pairs: candidates share one of 4 16-bit
    * signature chunks (any pair within Hamming distance 3 must agree on
    * at least one chunk — pigeonhole), then exact Hamming verify.
    */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {

    val base = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val chunked = (0 until 4).map { c =>
      base.select(
        lit(c).as("chunk"),
        shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("key"),
        col("id"), col("sig"))
    }.reduce(_ unionByName _)

    val lhs = chunked.select(col("chunk"), col("key"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val rhs = chunked.select(col("chunk"), col("key"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    lhs.join(rhs, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** D2c — embedding-cosine near-dup pairs via the LSH candidate path
    * (reuses Similarity's bucketing through a self top-k, then filters by
    * similarity threshold). For corpora where near-dup = same content
    * embedded, threshold ≈ 0.95+.
    */
  def embeddingNearDup(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 8, bitsPerBand: Int = 8): DataFrame =
    Similarity.lshTopK(df, idCol, vecCol, k = 20, bands = bands,
        bitsPerBand = bitsPerBand)
      .filter(col("cos") >= threshold && col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"), col("cos"))
}
