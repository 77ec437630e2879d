package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.t(spark, sf(), "documents")

  test("weightedSample: rate 0 keeps none, 1 keeps all, monotone in rate, ≈fraction") {
    val n = docs.count()
    assert(docs.filter(Curation.weightedSample(col("doc_id"), lit(0.0))).count() === 0)
    assert(docs.filter(Curation.weightedSample(col("doc_id"), lit(1.0))).count() === n)
    val at = (r: Double) => docs
      .filter(Curation.weightedSample(col("doc_id"), lit(r)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (s2, s5) = (at(0.2), at(0.5))
    assert(s2.subsetOf(s5), "a higher rate must keep a superset")
    assert(math.abs(s5.size.toDouble / n - 0.5) < 0.1)
    // constant rate coincides with hashSample's fixed-fraction draw
    assert(at(0.3) === docs.filter(Curation.hashSample(col("doc_id"), 0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("negativePairs: deterministic, seed-sensitive, self-free, bounded") {
    val n = docs.count()
    def pairs(seed: Long) = Curation.negativePairs(docs, "doc_id", k = 2, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p7 = pairs(7L)
    assert(p7 === pairs(7L), "same seed must reproduce the same pairs")
    assert(p7 != pairs(8L), "a different seed must redraw the pairing")
    assert(p7.forall { case (a, b) => a != b }, "no self pairs")
    // at most k per id; at least (n - 256·k) ids got a full k partners
    val perId = p7.groupBy(_._1).view.mapValues(_.size)
    assert(perId.values.forall(_ <= 2))
    assert(perId.count(_._2 == 2) >= n - 256 * 2)
  }

  test("hashSample is deterministic and near the requested fraction") {
    val n = docs.count()
    val sampled = docs.filter(Curation.hashSample(col("doc_id"), 0.30))
    val k = sampled.count()
    // binomial(500, 0.3): mean 150, sd ~10 — wide bounds, zero flake
    assert(k > n * 0.15 && k < n * 0.45, s"sample size $k of $n")
    // rerun selects the identical set
    val again = docs.filter(Curation.hashSample(col("doc_id"), 0.30))
    assert(sampled.select("doc_id").except(again.select("doc_id")).isEmpty)
    // fraction 0 and 1 are exact
    assert(docs.filter(Curation.hashSample(col("doc_id"), 0.0)).count() === 0)
    assert(docs.filter(Curation.hashSample(col("doc_id"), 1.0)).count() === n)
  }

  test("hashSample nests: a 10% sample is a subset of the 30% sample") {
    val p10 = docs.filter(Curation.hashSample(col("doc_id"), 0.10)).select("doc_id")
    val p30 = docs.filter(Curation.hashSample(col("doc_id"), 0.30)).select("doc_id")
    assert(p10.except(p30).isEmpty)
  }

  test("stratifiedSample returns exactly perGroup rows per group, deterministically") {
    val s = Curation.stratifiedSample(docs, "source", "doc_id", perGroup = 3)
    val counts = s.groupBy("source").count().select("count").as[Long].collect()
    assert(counts.forall(_ === 3L))
    val a = s.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Curation.stratifiedSample(docs, "source", "doc_id", 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("shuffleOrder: deterministic seeded permutation, not storage order") {
    def order(seed: Long) = Curation.shuffleOrder(docs, "doc_id", seed)
      .select("doc_id").as[Long].collect().toSeq
    val a = order(7L)
    assert(a === order(7L))                      // reproducible
    assert(a.sorted === docs.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(a !== a.sorted)                       // actually permuted
    assert(order(8L) !== a)                      // seed-dependent
  }

  test("assignSplit: stable labels, full coverage, ~requested proportions") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.assignSplit(docs, "doc_id", splits, seed = 7L)
      .select($"doc_id", $"split").as[(Long, String)].collect()
    assert(out.length === docs.count())
    val byLabel = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel("train").toDouble / out.length > 0.65)
    // stability: membership depends only on (seed, id) — a grown corpus
    // keeps every existing assignment (no train/test leakage on rebuild)
    val sub = Curation.assignSplit(docs.filter($"doc_id" < 20), "doc_id",
        splits, seed = 7L)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val full = out.toMap
    sub.foreach { case (id, s) => assert(full(id) === s) }
    intercept[IllegalArgumentException](
      Curation.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4), 7L))
  }

  test("contaminationByShingle flags docs overlapping the benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "she saw the quick brown fox jumps over the fence"),
      (2L, "completely unrelated words about spark and parquet files"),
      (3L, "the quick brown fox jumps over the lazy dog tonight again")) // near-copy
      .toDF("doc_id", "text")
    val out = Curation.contaminationByShingle(corpus, bench, "doc_id", "text",
        k = 5, minOverlap = 3L)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    // doc 3 contains the full benchmark text → shares all 6 of its
    // 5-shingles; doc 1 shares exactly 3 ("the quick brown fox jumps",
    // "quick brown fox jumps over", "brown fox jumps over the");
    // doc 2 shares none and is absent
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === 3L)
    assert(out(3L) === 6L)
    // raising the threshold excludes the marginal doc
    val strict = Curation.contaminationByShingle(corpus, bench, "doc_id", "text",
        k = 5, minOverlap = 4L)
      .select("doc_id").as[Long].collect().toSeq
    assert(strict === Seq(3L))
  }

  test("contaminationBloom: identical result to the exact path, with a real pre-filter cut") {
    val real = Tables.t(spark, sf(), "documents")
    val bench = real.filter($"doc_id" < 25)
    val corpus = real.filter($"doc_id" >= 25)
    val exact = Curation.contaminationByShingle(corpus, bench, "doc_id", "text",
        k = 5, minOverlap = 3L)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val bloom = Curation.contaminationBloom(corpus, bench, "doc_id", "text",
        k = 5, minOverlap = 3L)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // no false negatives: the Bloom path returns the exact answer
    assert(bloom === exact)
    // and the pre-filter genuinely cuts the corpus explode: count the
    // rows the Bloom predicate itself passes (the exact rows the join
    // would otherwise probe)
    val shingleOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => explode(graft.functions.TextFunctions.shingles(t, 5))
    val corpusShingles = corpus.select(shingleOf($"text").as("sh"))
    val allShingles = corpusShingles.count()
    val pred = Curation.bloomPredicate(
      bench.select(shingleOf($"text").as("sh")).distinct(), "sh")
    val bloomSurvivors = corpusShingles.filter(pred($"sh")).count()
    assert(bloomSurvivors < allShingles / 2,
      s"pre-filter barely cut the explode: $bloomSurvivors of $allShingles")
  }

  test("mixByWeight repeats rows per group weight with epoch tags; unlisted groups pass once") {
    val mixed = Curation.mixByWeight(docs, "source", Seq("src0" -> 3, "src1" -> 0))
    val bySource = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    val orig = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource("src0") === orig("src0") * 3)
    assert(!bySource.contains("src1")) // weight 0 drops the group
    assert(bySource("src2") === orig("src2"))
    val epochs = mixed.filter($"source" === "src0")
      .select("epoch").distinct().as[Int].collect().sorted.toSeq
    assert(epochs === Seq(0, 1, 2))
  }

  test("boilerplateNgramStats: shared spans counted, unique docs at zero, all rows kept") {
    val corpus = Seq(
      (1L, "copyright acme corp all rights reserved alpha beta gamma"),
      (2L, "copyright acme corp all rights reserved delta epsilon zeta"),
      (3L, "entirely novel words nowhere else repeated once only here"),
      (4L, "hi")) // < k tokens → zero grams
      .toDF("doc_id", "text")
    val out = Curation.boilerplateNgramStats(corpus, "doc_id", "text",
        k = 3, minDocs = 2L)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // docs 1/2 share the 4 trigrams of "copyright acme corp all rights
    // reserved" (9 tokens → 7 grams each); docs 3/4 share nothing
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out(0) === ((1L, 7L, 4L, 4.0 / 7.0)))
    assert(out(1) === ((2L, 7L, 4L, 4.0 / 7.0)))
    assert(out(2) === ((3L, 7L, 0L, 0.0)))
    assert(out(3) === ((4L, 0L, 0L, 0.0))) // zero grams → frac 0, not NaN
    // every input row appears even when nothing is boilerplate
    val none = Curation.boilerplateNgramStats(corpus, "doc_id", "text", 3, 5L)
    assert(none.count() === 4)
    assert(none.agg(sum($"n_boiler")).as[Long].head() === 0L)
  }

  test("tfIdfTopTerms ranks rare-but-frequent terms above ubiquitous ones") {
    val corpus = Seq(
      (1L, "spark spark spark shuffle the the"),
      (2L, "the shuffle is fine"),
      (3L, "the plan is fine")) // "the" in all 3 docs, "spark" only in 1
      .toDF("doc_id", "text")
    val out = Curation.tfIdfTopTerms(corpus, "doc_id", "text", topK = 2)
      .orderBy($"doc_id", $"rank")
      .as[(Long, String, Long, Long, Double, Int)].collect()
    val doc1 = out.filter(_._1 == 1L)
    // doc 1: spark tf=3 df=1 → 3*3/1 = 9; shuffle tf=1 df=2 → 1.5;
    // the tf=2 df=3 → 2 — so (spark, the) are its top 2
    assert(doc1.map(t => (t._2, t._5)).toSeq === Seq("spark" -> 9.0, "the" -> 2.0))
    assert(doc1.map(_._6).toSeq === Seq(1, 2))
    // every doc yields exactly topK rows (ties broken by term)
    assert(out.groupBy(_._1).forall(_._2.length == 2))
    // determinism: equal scores order by term — doc 2 ties shuffle/is/
    // fine at 1.5 (each df=2) and "fine" < "is" < "shuffle" decides
    val doc2 = out.filter(_._1 == 2L).map(_._2).toSeq
    assert(doc2 === Seq("fine", "is"))
  }

  test("boilerplateNgramStats invariants at fixture scale; doubled corpus saturates") {
    val out = Curation.boilerplateNgramStats(docs, "doc_id", "text", 3, 2L)
    assert(out.count() === docs.count())
    assert(out.filter($"n_boiler" > $"n_grams" || $"n_boiler" < 0 ||
      $"boiler_frac" < 0.0 || $"boiler_frac" > 1.0).isEmpty)
    // union the corpus with an id-shifted copy of itself: every gram now
    // appears in >= 2 docs, so every doc with grams saturates at frac 1
    val doubled = docs.select($"doc_id", $"text")
      .unionByName(docs.select(($"doc_id" + 100000L).as("doc_id"), $"text"))
    val sat = Curation.boilerplateNgramStats(doubled, "doc_id", "text", 3, 2L)
    assert(sat.filter($"n_grams" > 0 && $"n_boiler" =!= $"n_grams").isEmpty)
  }

  test("tfIdfTopTerms invariants at fixture scale: dense ranks, ordered scores") {
    val out = Curation.tfIdfTopTerms(docs, "doc_id", "text", topK = 3)
      .orderBy($"doc_id", $"rank")
      .as[(Long, String, Long, Long, Double, Int)].collect()
    out.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._6).toSeq === (1 to rows.length), s"ranks not dense for doc $id")
      assert(rows.length <= 3)
      val scores = rows.sortBy(_._6).map(_._5)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not non-increasing by rank for doc $id")
    }
    // fixture docs all have >= 3 distinct terms → exactly 3 rows each
    assert(out.length === docs.count() * 3)
    assert(out.forall(_._5 > 0.0))
  }

  test("packByTokenBudget: offsets are exclusive prefix sums and bins bounded by budget") {
    val packed = Curation.packByTokenBudget(docs, "lang", "doc_id", "text", 2048L)
      .orderBy(col("lang"), col("doc_id"))
      .as[(Long, String, Long, Long, Long)].collect()
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var run = 0L
      rows.foreach { case (_, _, nTok, offset, bin) =>
        assert(offset === run, "offset must equal tokens before this doc")
        assert(bin === offset / 2048L)
        run += nTok
      }
      // bins are non-decreasing and contiguous from 0
      val bins = rows.map(_._5)
      assert(bins.head === 0L)
      assert(bins.zip(bins.tail).forall { case (x, y) => y == x || y == x + 1 || y > x })
    }
  }

  test("bm25TopK matches the hand formula on a tiny corpus") {
    val corpus = Seq(
      (0L, "a a b"),
      (1L, "b c"),
      (2L, "c c c d"),
      (3L, "a a a a") // no query terms -> absent from results
    ).toDF("doc_id", "text")
    val out = Curation.bm25TopK(corpus, "doc_id", "text",
        Seq("b", "c"), k = 10)
      .as[(Long, Double, Int)].collect().sortBy(_._3)

    // independent reimplementation of the documented score: rational
    // idf (2N-2df+1)/(2df+1), standard tf norm, term-ascending fold
    val n = 4.0
    val avgdl = (3 + 2 + 4 + 4).toDouble / n
    def idf(df: Double) = (2 * n - 2 * df + 1) / (2 * df + 1)
    def tfn(tf: Double, dl: Double) =
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    val s0 = idf(2) * tfn(1, 3)                     // doc 0: b
    val s1 = idf(2) * tfn(1, 2) + idf(2) * tfn(1, 2) // doc 1: b then c
    val s2 = idf(2) * tfn(3, 4)                     // doc 2: c
    val expected = Seq(0L -> s0, 1L -> s1, 2L -> s2)
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
    assert(out.toSeq === expected)
    assert(!out.exists(_._1 == 3L))
  }

  test("bm25TopK caps output at k with dense ranks") {
    val out = Curation.bm25TopK(docs, "doc_id", "text",
      Seq("hash", "join", "merge", "stream"), k = 20)
    val rows = out.as[(Long, Double, Int)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._3).sorted.toSeq === (1 to 20))
    // scores non-increasing in rank order
    val byRank = rows.sortBy(_._3).map(_._2)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  /** The scorer's contract, recomputed from first principles on the
    * JVM: md5 → first-byte bucket → Knuth weight → left-fold mean. */
  private def referenceQualityScore(text: String): Double = {
    val words = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    if (words.isEmpty) 0.0
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val ws = words.map { w =>
        val b = md.digest(w.getBytes("UTF-8"))(0) & 0xff
        ((b.toLong * 2654435761L + 104729L) % 2001L).toDouble / 1000.0 - 1.0
      }
      ws.foldLeft(0.0)(_ + _) / words.size
    }
  }

  test("hashedQualityScore matches the JVM reference implementation exactly") {
    val texts = Seq(
      (1L, "The quick brown fox, JUMPS over 42 lazy dogs!"),
      (2L, "spark catalyst tungsten codegen shuffle partition"),
      (3L, ""), (4L, "   ...!!!   "), (5L, "a"),
      (6L, "word word word word word")) // repeated token: weight counted per occurrence
    val out = texts.toDF("doc_id", "text")
      .select($"doc_id", Curation.hashedQualityScore($"text").as("s"))
      .as[(Long, Double)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(out(id) === referenceQualityScore(t), s"doc $id")
    }
    assert(out(3L) === 0.0 && out(4L) === 0.0) // no tokens -> neutral 0
    assert(out.values.forall(s => s >= -1.0 && s <= 1.001))
  }

  test("hashedQualityScore splits the fixture corpus non-trivially at 0") {
    val docs = graft.core.Tables.t(spark, sf(), "documents")
      .select(Curation.hashedQualityScore($"text").as("s"))
    val n = docs.count()
    val kept = docs.filter($"s" >= 0.0).count()
    assert(kept > 0 && kept < n, s"degenerate split: $kept of $n")
  }
}
