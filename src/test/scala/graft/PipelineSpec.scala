package graft

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The composed training-data pipeline the north-star operators exist
  * for: quality filter → language filter → exact dedup → near-dup dedup
  * → per-language token accounting. Asserts each stage's contract on
  * the fixture corpus. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("documents flow through the full curation pipeline") {
    val docs = Tables.t(spark, sf(), "documents")
    val n0 = docs.count()

    // 1. quality + heuristic filters (pure column expressions — one scan)
    val scored = docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
    val kept = scored.filter(col("quality") >= 0.5 && col("n_tokens") >= 5)
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup (hash-agg): fixture texts are unique → no-op
    val exactKept = kept.join(
      Dedup.exact(kept, "doc_id", "text").select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val n2 = exactKept.count()
    assert(n2 <= n1)

    // 3. near-dup dedup: LSH pairs → components → keepers
    val pairs = Dedup.minHashLsh(exactKept, "doc_id", "text",
      shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val curated = Dedup.dedupByClusters(exactKept, "doc_id", pairs)
    val n3 = curated.count()
    assert(n3 < n2, s"expected near-dups to be removed ($n3 vs $n2)")

    // 4. per-language token accounting on the curated set
    val stats = curated.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("tokens"))
      .as[(String, Long, Long)].collect()
    assert(stats.map(_._2).sum === n3)
    assert(stats.forall(_._3 > 0))

    // 5. cross-doc boilerplate screen (round-4 op): drop docs whose
    // shared-3-gram fraction exceeds 0.9 — near-total boilerplate
    import graft.operators.Curation
    val boiler = Curation.boilerplateNgramStats(curated, "doc_id", "text", 3, 4L)
    val clean = curated.join(
      boiler.filter(col("boiler_frac") <= 0.9).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val n4 = clean.count()
    assert(n4 > 0 && n4 <= n3)

    // 6. stable train/val split, then token-budget packing of train —
    // the splits partition the cleaned set exactly
    val split = Curation.assignSplit(clean, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1), seed = 7L)
    val bySplit = split.groupBy(col("split")).count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.values.sum === n4)
    val train = split.filter(col("split") === "train")
    val packed = Curation.packByTokenBudget(train, "lang", "doc_id", "text", 2048L)
    assert(packed.count() === train.count())
    assert(packed.agg(min(col("bin"))).as[Long].head() === 0L)
  }
}
