package graft

import graft.core.Det
import graft.operators.{AsOfJoin, Dedup, Resample, Similarity}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Degenerate-input behavior: empty/singleton frames through every
  * operator family — the shapes that show up at the edges of real
  * partitions (empty time ranges, single-document sources, corpora with
  * no near-dups). */
class EdgeCasesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("id", "text")
  private lazy val oneDoc =
    Seq((1L, "just one document here")).toDF("id", "text")

  test("as-of join with empty right side yields all-null values") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "t", "tag")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "k", "t", Seq("v" -> "lv"))
    assert(out.count() === 1)
    assert(out.select("lv").as[Option[Double]].head() === None)
    assert(AsOfJoin.asOfInner(left, right, "k", "t", "k", "t",
      Seq("v" -> "lv")).count() === 0)
  }

  test("dedup family on empty and singleton corpora") {
    assert(Dedup.exact(emptyDocs, "id", "text").count() === 0)
    assert(Dedup.exact(oneDoc, "id", "text").count() === 1)
    assert(Dedup.minHashLsh(emptyDocs, "id", "text").count() === 0)
    assert(Dedup.minHashLsh(oneDoc, "id", "text").count() === 0)
    assert(Dedup.simHashPairs(oneDoc, "id", "text").count() === 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(noPairs).count() === 0)
    assert(Dedup.dedupByClusters(oneDoc, "id", noPairs).count() === 1)
  }

  test("semanticDedup on degenerate corpora: empty, singleton, all-identical") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semanticDedup(empty, "vec_id", "embedding", 0.9).count() === 0)
    val one = Seq((5L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    // a corpus smaller than nlist still works: every available point
    // below nlist seeds a centroid; the single point keeps itself
    assert(Dedup.semanticDedup(one, "vec_id", "embedding", 0.9, nlist = 16)
      .select("vec_id").as[Long].collect().toSeq === Seq(5L))
    // all-identical vectors collapse to the lowest id
    val same = (0L to 9L).map(i => (i, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    assert(Dedup.semanticDedup(same, "vec_id", "embedding", 0.99, nlist = 4)
      .select("vec_id").as[Long].collect().toSeq === Seq(0L))
  }

  test("hashedQualityScore: null text scores null, not a crash") {
    import graft.operators.Curation
    val df = Seq((1L, Option("some real words")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select($"id", Curation.hashedQualityScore($"text").as("s"))
    val rows = df.as[(Long, Option[Double])].collect().toMap
    assert(rows(1L).isDefined)
    assert(rows(2L).isEmpty) // null in -> null out (SQL semantics)
  }

  test("similarity on singleton corpus excludes self and returns empty") {
    val one = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(one, one, "vec_id", "embedding", 5)
      .count() === 0)
    assert(Similarity.lshTopK(one, "vec_id", "embedding", 5).count() === 0)
  }

  test("resample of a single row is that row's bucket") {
    val df = Seq((ts("2024-01-01 10:30:00"), 2.5)).toDF("ts", "v")
    val out = Resample.resample(df, "ts", "hour", "INTERVAL 1 HOUR",
      Seq((count(lit(1)), "n"), (Det.dsum(col("v")), "s")),
      Map("n" -> lit(0L), "s" -> lit(0.0)))
    assert(out.as[(Timestamp, Long, Double)].collect().toSeq ===
      Seq((ts("2024-01-01 10:00:00"), 1L, 2.5)))
  }

  test("curation text ops on empty and singleton corpora") {
    import graft.operators.{Curation, Layout}
    assert(Curation.boilerplateNgramStats(emptyDocs, "id", "text", 3, 2L)
      .count() === 0)
    // a singleton corpus can never reach minDocs >= 2: zero boilerplate
    val one = Curation.boilerplateNgramStats(oneDoc, "id", "text", 3, 2L)
      .as[(Long, Long, Long, Double)].head()
    assert(one === ((1L, 2L, 0L, 0.0)))
    assert(Curation.tfIdfTopTerms(emptyDocs, "id", "text", 3).count() === 0)
    // singleton: every term has df = 1 = N → score = tf exactly
    val tfidf = Curation.tfIdfTopTerms(oneDoc, "id", "text", 10)
    assert(tfidf.filter(col("score") =!= col("tf").cast("double")).isEmpty)
    // z-order of an empty frame / a degenerate one-point domain
    val emptyEv = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Layout.zOrderBy(emptyEv, "a", 0L, 10L, "b", 0L, 10L, 4).count() === 0)
    assert(Seq((5L, 5L)).toDF("a", "b")
      .select(Layout.zValue2(
        Layout.scaleToBits(col("a"), 5L, 5L, 4),
        Layout.scaleToBits(col("b"), 5L, 5L, 4), 4).as("z"))
      .as[Long].head() === 0L)
  }

  test("empty time range through the reference query path") {
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(java.nio.file.Files
        .createTempDirectory("edge").toString))
    db.createTable("t")
    db.insertSeq("t", Seq(graft.core.ChronoRow("k",
      ts("2024-01-01 10:00:00"), Array[Byte](1))))
    // start > end → empty, no error (matches filtering semantics)
    assert(db.query("t", ts("2024-01-02 00:00:00"),
      ts("2024-01-01 00:00:00")).count() === 0)
  }

  test("PQ with a corpus smaller than the codebook still ranks exactly") {
    // ks=16 but only 3 vectors exist: every vector is its own centroid,
    // codes reconstruct losslessly, ADC == exact L2 → brute-force order
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 2, m = 1, subDim = 2, ks = 16,
        candidates = 4)
      .orderBy($"rank").select("neighbor_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("chunking: empty, shorter-than-chunk, and boundary-length docs") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, ""),              // empty → itself as chunk 0
      (2L, "ab"),            // shorter than one chunk
      (3L, "a" * 10),        // exactly one chunk (chunk=10, overlap=4)
      (4L, "b" * 11))        // one past the boundary → 2 chunks
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text", 10, 4)
      .orderBy($"doc_id", $"chunk_id")
      .select($"doc_id", $"chunk_id", $"chunk").as[(Long, Int, String)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 0, ""), (2L, 0, "ab"), (3L, 0, "a" * 10),
      (4L, 0, "b" * 10), (4L, 1, "b" * 5))) // stride 6 → tail chunk chars 7..11
    // overlap really overlaps: consecutive chunks share overlap chars
    val big = Seq((9L, ('a' to 'z').mkString)).toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(big, "doc_id", "text", 10, 4)
      .orderBy($"chunk_id").select($"chunk").as[String].collect()
    assert(chunks(0).takeRight(4) === chunks(1).take(4))
  }

  test("TWAP: single observation owns its whole bucket; value preserved") {
    val one = Seq(("s", ts("2024-01-01 10:59:00"), 42.5))
      .toDF("k", "t", "v")
    val out = Resample.twa(one, "k", "t", "v", "hour").collect()
    assert(out.length === 1)
    // one sample → TWA is exactly its value regardless of position
    assert(out(0).getAs[Double]("twa") === 42.5)
    assert(out(0).getAs[Long]("n") === 1L)
  }

  test("funnel: a step with no events empties every later step, not earlier ones") {
    import graft.operators.Funnel
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")))
      .toDF("u", "et", "t")
    val out = Funnel.funnelCounts(ev, "u", "et", "t",
        Seq("view", "click", "purchase"))
      .orderBy($"step_no")
      .select($"step", $"users").as[(String, Long)].collect().toSeq
    // no clicks anywhere: purchases exist but cannot be reached THROUGH
    // the click step — order matters, that's the funnel
    assert(out === Seq(("view", 2L), ("click", 0L), ("purchase", 0L)))
  }

  test("empty insert batch through the observe-based sidecar path") {
    // an all-TTL-dropped (or simply empty) batch must write no sidecar
    // rows, leave the table consistent, and not hang on the observed
    // metric (the write job still runs, with zero rows through it)
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(java.nio.file.Files
        .createTempDirectory("edgeempty").toString, ttl = Some(3600L)))
    db.createTable("t")
    db.insertSeq("t", Seq.empty)
    assert(db.sidecarsConsistent("t"))
    assert(db.table("t").count() === 0)
    // insert whose every row is older than TTL → dropped at the gate
    db.insertSeq("t", Seq(graft.core.ChronoRow("k",
      ts("2024-01-01 00:00:00"), Array[Byte](1))), ts("2024-06-01 00:00:00"))
    assert(db.table("t").count() === 0)
    assert(db.sidecarsConsistent("t"))
    assert(db.approxDistinctKeys("t",
      ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")) === 0L)
    db.close()
  }
}
