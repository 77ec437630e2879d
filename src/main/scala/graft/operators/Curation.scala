package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: deterministic sampling and sequence packing.
  * (The reference has no sampling or batching surface at all —
  * SURVEY.md §2b; these extend the north-star D-family.)
  *
  * Everything here is DETERMINISTIC — sampling decisions derive from a
  * content/id hash, never from an RNG — so runs are reproducible,
  * resumable after failure, and cross-engine verifiable (the DuckDB
  * oracle replicates md5 exactly). That is the property a 100 TB curation
  * job actually needs: re-running a failed partition must select the
  * same rows.
  */
object Curation {

  /** The 8-hex-char threshold under which a uniform md5-derived 32-bit
    * draw falls with probability `fraction` (lowercase hex sorts in
    * numeric order). Shared by [[hashSample]]/[[assignSplit]] and their
    * oracle SQL so both sides of the check derive from one formula. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    f"${(fraction * 4294967296.0).toLong min 0xFFFFFFFFL}%08x"
  }

  /** Uniform deterministic sample predicate: keep a row iff the first 8
    * hex chars of md5(id) — a uniform 32-bit draw derived from the row
    * itself — fall under `fraction`. The comparison is done on the hex
    * STRING against a precomputed threshold (lowercase hex sorts in
    * numeric order), so any engine with md5 reproduces the exact same
    * sample. No shuffle, no sort, no RNG state: a pure filter that
    * scales embarrassingly.
    */
  def hashSample(idCol: Column, fraction: Double): Column =
    substring(md5(idCol.cast("string")), 1, 8) < lit(hexThreshold(fraction))

  /** Weighted deterministic Bernoulli sample: keep a row with
    * probability `rateCol` (a per-row column in [0,1] — the per-source
    * mixing rates of a dataset recipe, a quality-score ramp, …), decided
    * by the same portable md5 draw as [[hashSample]] but against a
    * PER-ROW threshold. Still a pure map-side filter — no shuffle, no
    * RNG state, reproducible across reruns and engines. The threshold
    * is floor(rate·2³²) rendered as 8 lowercase hex digits (hex strings
    * sort numerically), so an oracle reproduces the exact sample;
    * double→long truncation equals floor for the non-negative rates.
    * `rate >= 1` short-circuits to keep-all (the hex comparison alone
    * would drop the single maximal draw `ffffffff`). The rate is
    * clamped to [0, 1] first: a negative rate's long threshold would
    * otherwise hex-render as 16 f's, and the lpad truncation to
    * "ffffffff" would silently KEEP almost every row — the exact
    * opposite of the keep-none a caller handing in a broken rate
    * column should degrade to. */
  def weightedSample(idCol: Column, rateCol: Column): Column = {
    val draw = substring(md5(idCol.cast("string")), 1, 8)
    val rate = greatest(lit(0.0), least(lit(1.0), rateCol.cast("double")))
    val thr = (rate * lit(4294967296.0)).cast("long")
    rate >= 1.0 || draw < lpad(lower(hex(thr)), 8, "0")
  }

  /** Deterministic negative-pair mining for contrastive training: each
    * id pairs with the next `k` ids in a SEEDED content-hash order —
    * pseudo-random partners (hash order is independent of any data
    * attribute), reproducible across reruns and engines, no RNG state.
    *
    * Scale shape: a global hash order would need one global sort; this
    * partitions the order by the hash's first byte (256 buckets —
    * uniform by construction, so each window partition holds ~n/256
    * rows) and pairs WITHIN the bucket: one hash exchange + per-bucket
    * sorts, and k lead() columns over one window spec. The last rows
    * of each bucket yield fewer than k pairs (no wrap-around) — at
    * corpus scale that tail is 256·k rows, noise. Changing the seed
    * redraws the entire pairing without touching the data. */
  def negativePairs(
      df: DataFrame, idCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 1 && k <= 16, s"k out of range: $k")
    val base = df.select(col(idCol).as("id_a"))
      .withColumn("__h", seededKey(col("id_a"), seed))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col("id_a"))
    // windows must be materialized in a Project BEFORE the generator —
    // Spark rejects window expressions inside explode()'s argument
    val leads = (1 to k).map(i => lead(col("id_a"), i).over(w).as(s"__n$i"))
    base
      .select(col("id_a") +: leads: _*)
      .select(col("id_a"),
        explode(array((1 to k).map(i => col(s"__n$i")): _*)).as("id_b"))
      .filter(col("id_b").isNotNull)
  }

  /** The seeded per-row draw shared by [[shuffleOrder]] and
    * [[assignSplit]]: md5("<seed>:<id>") — changing the seed produces an
    * independent permutation/split without touching the data. */
  private def seededKey(idCol: Column, seed: Long): Column =
    md5(concat_ws(":", lit(seed.toString), idCol.cast("string")))

  /** Deterministic corpus shuffle — the global permutation every
    * pretraining run needs before batching. Rows are totally ordered by
    * a seeded content hash, so the permutation is reproducible (rerun a
    * failed job, get the same order), seed-independent of the storage
    * order, and cross-engine verifiable. At scale this is exactly one
    * range-partitioned sort (Exchange(rangepartitioning) + per-partition
    * Sort) — the minimum any true global shuffle costs — and the sorted
    * write preserves the order per output partition. */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key", seededKey(col(idCol), seed))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Deterministic train/validation/test split: each row draws a seeded
    * uniform hash and is labeled by cumulative split fractions. Pure
    * map — no shuffle, no RNG state — and STABLE: a document keeps its
    * split across reruns and across corpus growth (membership depends
    * only on (seed, id)), which is what prevents silent train/test
    * leakage when the corpus is rebuilt.
    *
    * @param splits (label, fraction) in order; fractions must sum to 1.
    */
  def assignSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val draw = substring(seededKey(col(idCol), seed), 1, 8)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val chain = splits.init.zip(cum.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), c), acc) =>
        when(draw < lit(hexThreshold(c)), lit(name)).otherwise(acc)
      }
    df.withColumn("split", chain)
  }

  /** Stratified sample: exactly `perGroup` rows from each group, chosen
    * by md5(id) order (deterministic, uniform within group). One shuffle
    * on the group key + per-group top-k.
    *
    * Scale note: row_number needs a per-group sort, but WindowGroupLimit
    * pushes the k-limit into the sort (partial top-k per map task), so
    * the full group is never materialized — the same plan shape as the
    * q07/q27 top-k queries. For quota ≪ group size on skewed groups,
    * pre-filter with [[hashSample]] at a safely-larger percent first.
    */
  def stratifiedSample(
      df: DataFrame, groupCol: String, idCol: String, perGroup: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup)
      .drop("__rn")
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct k-shingles with ANY benchmark document — the
    * standard n-gram train/test contamination check. The benchmark's
    * shingle set is small (benchmarks are), so it broadcasts; the corpus
    * side explodes shingles and semi-aggregates per doc. Returns
    * (id, n_overlap) for contaminated docs.
    *
    * Scale note: the corpus-side explode is the cost — at 100 TB replace
    * the broadcast DataFrame with a broadcast Bloom filter of benchmark
    * shingle hashes and pre-filter before the exact join; the plan shape
    * (no corpus shuffle until the per-doc count) is unchanged.
    */
  def contaminationByShingle(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      k: Int, minOverlap: Long): DataFrame = {
    val bsh = benchmark
      .select(explode(TextFunctions.shingles(col(textCol), k)).as("sh"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), k)).as("sh"))
      .join(broadcast(bsh), Seq("sh"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The 100 TB form of [[contaminationByShingle]]: a broadcast Bloom
    * filter of the benchmark's shingle hashes pre-filters the corpus
    * explode BEFORE the exact join, so only the (tiny) fraction of
    * corpus shingles that might be benchmark shingles reaches the join.
    * Bloom filters have NO false negatives, so the exact semi-join that
    * follows sees every true match and the final (id, n_overlap) result
    * is IDENTICAL to the exact path — false positives cost a join probe
    * each, never a wrong answer. That containment is what lets the
    * declared query (d9b) share the exact path's oracle: a hash-match
    * end-to-end proves zero false negatives on real data.
    *
    * Plan shape: benchmark shingles → one distributed BloomFilterAggregate
    * (Spark's own runtime-filter sketch; `fpp` sizes it via the standard
    * -n·ln p/(ln 2)² bits formula) collapsed to ONE literal embedded in a
    * codegen'd BloomFilterMightContain probe — the explicit form of the
    * broadcast Spark's InjectRuntimeFilter builds for shuffle joins, here
    * applied where the optimizer can't see the opportunity (the join side
    * is an exploded expression, not a scan). No corpus shuffle before the
    * per-doc count, same as the exact operator.
    */
  def contaminationBloom(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      k: Int, minOverlap: Long,
      fpp: Double = 0.01): DataFrame = {
    val bsh = benchmark
      .select(explode(TextFunctions.shingles(col(textCol), k)).as("sh"))
      .distinct()
    val mightContain = bloomPredicate(bsh, "sh", fpp)
    corpus
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), k)).as("sh"))
      .filter(mightContain(col("sh")))
      .join(broadcast(bsh), Seq("sh"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Build a reusable membership pre-filter from a (small) key set: a
    * distributed BloomFilterAggregate over `keys(keyCol)`, collapsed to
    * one literal and returned as a codegen'd might-contain predicate
    * maker. No false negatives; ~`fpp` false positives — callers follow
    * with an exact join when exactness matters. The returned function
    * is reusable across any column expression of the same type. */
  def bloomPredicate(
      keys: DataFrame, keyCol: String, fpp: Double = 0.01): Column => Column = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp out of range: $fpp")
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // key-side count: small by definition (it sizes the filter)
    val nItems = math.max(keys.select(col(keyCol)).distinct().count(), 1L)
    val numBits = math.max(64L,
      math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bfBytes = keys.select(
        column(new BloomFilterAggregate(
          expression(xxhash64(col(keyCol))),
          expression(lit(nItems)), expression(lit(numBits))
        ).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    c => column(BloomFilterMightContain(
      expression(lit(bfBytes)), expression(xxhash64(c))))
  }

  /** Dataset mixing by per-group repetition weight: each row of group g
    * appears `weights(g)` times (default 1), tagged with an `epoch`
    * index — the deterministic form of "oversample source X 3:1" in a
    * training mix. The weight table broadcasts; the fan-out is a
    * partition-local explode, so the mix costs no shuffle at any scale.
    */
  def mixByWeight(
      df: DataFrame, groupCol: String, weights: Seq[(String, Int)]): DataFrame = {
    require(weights.forall(_._2 >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF(groupCol, "__w")
    val n = coalesce(col("__w"), lit(1))
    // sequence(0, -1) yields a DESCENDING [0,-1], not empty — weight 0
    // must map to an empty array so explode drops the group
    df.join(broadcast(w), Seq(groupCol), "left")
      .withColumn("epoch",
        explode(when(n > 0, sequence(lit(0), n - 1))
          .otherwise(array().cast("array<int>"))))
      .drop("__w")
  }

  /** Cross-document boilerplate detection: the fraction of each
    * document's distinct word k-grams that are shared by at least
    * `minDocs` documents corpus-wide. Headers, footers, license
    * blurbs, and templated spans repeat ACROSS documents — a signal
    * intra-document repetition ([[TextFunctions]] d4d) cannot see; the
    * public MassiveText/C4 pipelines drop or trim documents whose
    * duplicate-span fraction is high. Returns every input row as
    * (id, n_grams, n_boiler, boiler_frac) so callers choose the cut.
    *
    * Scale shape: per-doc distinct grams (map-side), one shuffle on the
    * gram to count document frequency, a semi-join back on the gram for
    * the boilerplate subset, one shuffle on the doc id to count — no
    * all-pairs stage anywhere, so it survives 100 TB the same way the
    * D2 family does. `boiler_frac` is one IEEE double division of two
    * integers (exactly reproducible cross-engine).
    */
  def boilerplateNgramStats(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = df.select(
      col(idCol),
      array_distinct(TextFunctions.shingles(col(textCol), k)).as("gs"))
    val grams = base.select(col(idCol), explode(col("gs")).as("g"))
    // grams are distinct per doc, so count(*) == count(DISTINCT doc)
    val boiler = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
      .select(col("g"))
    val perDoc = grams.join(boiler, Seq("g"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_boiler"))
    base.select(col(idCol), size(col("gs")).cast("long").as("n_grams"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        (coalesce(col("n_boiler"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1L)).cast("double")).as("boiler_frac"))
  }

  /** TF-IDF top terms per document — the keyword-extraction pass a
    * curation pipeline uses for topic tagging and mixture audits. Uses
    * the RATIONAL idf `N / doc_freq` (rank-equivalent to the log form
    * for ordering within a document, since x ↦ tf·f(df) with f
    * monotone decreasing preserves per-term comparisons only when tf is
    * equal — the linear form is a documented variant, chosen because
    * `CAST(tf*N AS DOUBLE) / df` is a single correctly-rounded IEEE
    * division both Spark and any SQL oracle reproduce bit-identically,
    * where `ln` is only within-1-ulp portable). Ties break on the term.
    *
    * Scale shape: tf = one shuffle on (doc, term); doc_freq derives
    * FROM tf (its rows are exactly the distinct (doc, term) pairs) and
    * PARTIAL-aggregates before its term-keyed exchange, so the
    * ubiquitous-term skew ("the" appears in every doc) arrives
    * pre-reduced to ≤1 row per map partition — a window-count
    * formulation would ship every (doc, term) row of a hot term to one
    * reducer. The tokenize+explode lineage still evaluates once per
    * branch: column pruning de-canonicalizes the shared (doc, term)
    * exchange, exactly the d2 verify-scoping effect in PLANS.md, and
    * recompute-over-cache is the deliberate discipline (caching the
    * exploded pairs at corpus scale costs more than re-reading). Corpus
    * size N joins in as a broadcast single-row aggregate (no
    * driver-side count action); the final per-doc top-k is a
    * WindowGroupLimit window — partial top-k before the exchange, the
    * q07/q27 plan shape.
    */
  def tfIdfTopTerms(
      df: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(
      col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"))
    val corpusN = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(docFreq, Seq("term"))
      .crossJoin(broadcast(corpusN))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("doc_freq").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"),
        col("score"), col("rank"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * bins by cumulative offset — bin = floor(exclusive-prefix-sum of
    * token counts / budget) within each `groupCol` partition, in `idCol`
    * order. This is offset-based chunking (documents may straddle a
    * boundary and get split at tokenization time), the formulation used
    * when bins must be computable in one distributed pass: a window
    * prefix-sum, no sequential scan, no driver loop.
    */
  def packByTokenBudget(
      df: DataFrame, groupCol: String, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol), col(groupCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / budget).cast("long"))
  }

  /** Document chunking — the pre-embedding/RAG splitter: each document
    * becomes ceil((len − overlap) / stride) fixed-size character
    * windows (stride = chunkChars − overlapChars; consecutive chunks
    * share `overlapChars` characters so no boundary-spanning phrase is
    * lost to the cut). A document shorter than one chunk yields itself
    * as chunk 0 — empty documents included, so no row silently
    * disappears from the corpus.
    *
    * Scale shape: pure map + a CONTROLLED posexplode (output mass =
    * Σ len/stride, decided per row by arithmetic, not data-dependent
    * joins) — no shuffle, no window; the chunker runs at scan speed in
    * front of the embedding stage. Integer-only chunk-count arithmetic
    * and 1-based substring windows replicate exactly in SQL.
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, overlapChars: Int): DataFrame = {
    require(chunkChars > 0 && overlapChars >= 0 && overlapChars < chunkChars,
      s"chunking needs 0 <= overlap < chunk, got ($chunkChars, $overlapChars)")
    val stride = chunkChars - overlapChars
    // integer-only ceil — bit-free of fp, same formula in the oracle SQL
    val n = greatest(lit(1L), expr(
      s"(length($textCol) - $overlapChars + ${stride - 1}) DIV $stride"))
    df.select(col(idCol), col(textCol), n.as("n_chunks"))
      .select(col(idCol), col("n_chunks"),
        posexplode(transform(sequence(lit(0L), col("n_chunks") - 1),
          i => col(textCol).substr((i * stride + 1).cast("int"),
            lit(chunkChars)))))
      .select(col(idCol), col("pos").cast("int").as("chunk_id"),
        col("col").as("chunk"), col("n_chunks"))
  }

  /** BM25 retrieval: score every document against a fixed bag of query
    * terms, return the global top-k. The retrieval primitive of a
    * training-data pipeline (mine hard positives for a topic, rank a
    * corpus slice against a probe query) — the reference has no text
    * surface at all (SURVEY.md §2b).
    *
    * Scoring is BM25 with a RATIONAL idf: the classic
    * ln((N-df+0.5)/(df+0.5)) is replaced by the ratio itself,
    * (2N-2df+1)/(2df+1), computed as ONE correctly-rounded IEEE
    * division of integral operands. ln is monotone, so per-term
    * rankings are identical; the cross-term sum weights common terms
    * somewhat higher than the log form — a deliberate, documented
    * trade for an oracle-exact score (ln diverges 1 ulp between
    * engines; see Det and tfIdfTopTerms precedent). The tf
    * normalization tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) is standard
    * BM25, every step an IEEE op on identical operand trees in both
    * engines. The per-document score is an ORDERED fold of the
    * per-term scores (term-ascending, 0.0 seed) — double addition is
    * not associative, so an unordered SUM would be partition-order
    * nondeterministic.
    *
    * Scale shape: the tokenize→explode→tf aggregation is the ONLY
    * wide op over token rows, and terms are filtered BEFORE it, so
    * that shuffle carries query-term hits only — not corpus tokens.
    * doc_freq is a window over the already-tiny tf frame (docs×terms
    * rows), NOT a second corpus tokenization; dl is size(tokens(text))
    * — a map-only projection with no explode and no shuffle (its
    * global sum for avgdl re-runs that map lineage once: a second
    * corpus SCAN, but zero shuffle and zero explode). Corpus stats
    * (N, avgdl — one row) broadcast into the score; the final top-k is
    * TakeOrderedAndProject (per-partition heads, no global sort).
    */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(k >= 1, s"topK must be >= 1, got $k")
    val terms = queryTerms.distinct
    // per-doc length over ALL tokens (BM25's dl): size of the token
    // array — map-only, no explode, no shuffle
    val dl = df.select(col(idCol),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
    // corpus constants: one row — n_docs from the corpus (docs with
    // zero tokens still count), avgdl as an exact integral division
    val stats = dl.agg(sum(col("dl")).as("sum_dl"))
      .crossJoin(df.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val tf = df.select(
        col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // df per term as a window over the tiny tf frame (one row per
    // (doc, term)) — NOT a second corpus tokenization
    val scored = tf
      .withColumn("doc_freq",
        count(lit(1)).over(Window.partitionBy(col("term"))))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (lit(2) * col("n_docs") - lit(2) * col("doc_freq") + lit(1))
          .cast("double") /
          (lit(2) * col("doc_freq") + lit(1)).cast("double"))
      .withColumn("tfn",
        (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("tscore", col("idf") * col("tfn"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(collect_list(struct(col("term"), col("tscore"))).as("ts"))
      .select(col(idCol),
        aggregate(array_sort(col("ts")), lit(0.0),
          (acc, x) => acc + x.getField("tscore")).as("score"))
    // global top-k: orderBy+limit compiles to TakeOrderedAndProject
    // (per-partition bounded heaps); the rank window then runs over k
    // rows, not the corpus
    val topk = perDoc.orderBy(col("score").desc, col(idCol)).limit(k)
    topk.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol)))
          .cast("int"))
      .select(col(idCol), col("score"), col("rank"))
  }

  /** D34 — model-based quality scoring with a hashed linear classifier:
    * the fastText/CCNet filtering recipe (Joulin et al. 2016; Wenzek et
    * al. 2020) with the feature-hashing trick (Weinberger et al. 2009).
    * Each token hashes into one of 256 feature buckets (first two hex
    * chars of md5 — the portable-draw convention of [[hashSample]]);
    * the model is a weight per bucket; a document's score is the mean
    * weight of its tokens, and `score >= 0` is the keep decision.
    *
    * The weights here are a DETERMINISTIC function of the bucket id
    * (Knuth multiplicative hash into [-1, 1], exact int64 arithmetic)
    * so the whole scorer — hashing, lookup, fold — is reproducible
    * cross-engine and the oracle recomputes it from scratch; a real
    * deployment broadcasts trained weights instead (same plan shape:
    * the lookup is a map-side array index either way).
    *
    * Scale shape: zero shuffles — tokenize, hash, fold, and threshold
    * are one codegen'd map stage over the corpus scan (builtin HOFs,
    * no explode: the token array folds in place). At 100 TB this is
    * the cheapest possible full-corpus pass; the left fold over each
    * doc's token array gives one defined fp summation order, so scores
    * are bit-identical across engines and reruns.
    */
  def hashedQualityScore(textCol: Column): Column = {
    val words = TextFunctions.tokens(textCol)
    def weight(w: Column): Column = {
      val b = conv(substring(md5(w), 1, 2), 16, 10).cast("long")
      ((b * lit(2654435761L) + lit(104729L)) % lit(2001L)).cast("double") /
        lit(1000.0) - lit(1.0)
    }
    when(size(words) === 0, lit(0.0))
      .otherwise(
        aggregate(words, lit(0.0), (acc, w) => acc + weight(w)) /
          size(words).cast("double"))
  }
}
