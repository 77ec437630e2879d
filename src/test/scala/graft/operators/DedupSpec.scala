package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from the loud hunters"
  private val nearDup = base.replace("green", "dark") // one-token change
  private val unrelated = "completely different content about spark query " +
    "engines and distributed columnar storage systems with vectorized reads"

  private lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base) // 4 = exact dup of 1
  ).toDF("id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, "id", "text").collect()
    assert(out.length === 3)
    val dupRow = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupRow.getAs[Long]("keep_id") === 1L)
  }

  test("shingle jaccard: identical=1, near-dup high, unrelated low") {
    val j = docs.as("a").crossJoin(docs.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        Dedup.shingleJaccard($"a.text", $"b.text", 3).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 4L)) === 1.0)
    assert(j((1L, 2L)) > 0.6 && j((1L, 2L)) < 1.0)
    assert(j((1L, 3L)) < 0.05)
  }

  test("minhash LSH finds near-dup and exact-dup pairs, not unrelated") {
    val pairs = Dedup.minHashLsh(docs, "id", "text",
        shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash signature approximates jaccard") {
    val sigs = docs.select($"id",
        Dedup.minHashSignature($"text", 3, 128).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs(1L), sigs(4L)) === 1.0)
    assert(math.abs(est(sigs(1L), sigs(2L)) - 0.75) < 0.2) // true J ~ .75
    assert(est(sigs(1L), sigs(3L)) < 0.15)
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val sigs = docs.select($"id", Dedup.simHash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(4L)) === 0)
    assert(ham(sigs(1L), sigs(2L)) <= 12)
    assert(ham(sigs(1L), sigs(3L)) > 12)
  }

  test("simhash pair generation respects maxHamming") {
    val pairs = Dedup.simHashPairs(docs, "id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("bucketPairs caps a degenerate bucket: linear pairs, connectivity kept") {
    // one giant bucket of 300 members — the boilerplate-cluster shape
    // that is quadratic (44 850 pairs) without the cap
    val banded = (1L to 300L).toDF("id")
      .select(lit(0).as("band"), lit(7L).as("bucket"), $"id", lit(0).as("pl"))
    val pairs = Dedup.bucketPairs(banded, maxBucket = 16, chainWidth = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // head: C(16,2)=120 full pairs; tail: 284 members × (2 chain + 1 anchor)
    assert(pairs.length === 120 + 284 * 3)
    assert(pairs.forall { case (a, b) => a < b })
    // anchor keeps the capped bucket 1-hop connected to the head
    assert((17L to 300L).forall(i => pairs.contains((1L, i))))
    // stats report the capped vs uncapped mass — no silent truncation
    val st = Dedup.lshBucketStats(banded, maxBucket = 16, chainWidth = 2)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(st.toSeq === Seq((0, 7L, 300L, 44850L, (120 + 284 * 3).toLong)))
  }

  test("bucketPairs is unchanged for buckets at or under the cap") {
    val banded = (1L to 16L).toDF("id")
      .select(lit(0).as("band"), lit(7L).as("bucket"), $"id", lit(0).as("pl"))
    val capped = Dedup.bucketPairs(banded, maxBucket = 16, chainWidth = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = (1L to 16L).flatMap(a => (a + 1 to 16L).map(a -> _)).toSet
    assert(capped === full)
  }

  test("degenerate 300-identical-doc corpus dedups to one keeper, capped") {
    val dup = (1L to 300L).map(i => (i, base)).toDF("id", "text")
    val pairs = Dedup.minHashLsh(dup, "id", "text",
      shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5,
      maxBucket = 16, chainWidth = 2)
    // identical docs share every band bucket; capped pair set is linear
    assert(pairs.count() === (120 + 284 * 3).toLong)
    val kept = Dedup.dedupByClusters(dup, "id", pairs)
      .select("id").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }

  test("semanticDedupAssigned degenerate-cell cap: linear pair mass, anchor settles the all-similar cell, small cells exact") {
    // a collapsed-quantizer shape: 120 near-identical vectors all in
    // cell 0 (pairwise cos ~1 — quadratic without the cap) + a
    // 10-member mixed cell 1 that must stay bit-identical to uncapped
    val big = (1L to 120L).map(i =>
      (i, Seq(1.0f, 0.0f, (i % 3) * 1e-4f), 0))
    val small = (200L to 209L).map(i =>
      (i, Seq(0.0f, 1.0f, (i % 5) * 0.3f), 1))
    val assigned = (big ++ small).toDF("__id", "__vec", "cell")
    val uncapped = Dedup.semanticDedupAssigned(assigned, "id", 0.99)
      .select("id").as[Long].collect().sorted.toSeq
    val capped = Dedup.semanticDedupAssigned(assigned, "id", 0.99,
        maxCell = 16)
      .select("id").as[Long].collect().sorted.toSeq
    // greedy rule on the all-similar cell: everyone loses to the
    // anchor (the cell's lowest id) — which the chain+anchor pairing
    // reaches by construction, so the capped verdict is EXACT here
    assert(capped.count(_ <= 120L) === 1)
    assert(capped.head === 1L)
    assert(capped === uncapped)
    // sidecar-known sizes take the same branch without a sizing pass
    val known = Dedup.semanticDedupAssigned(assigned, "id", 0.99,
        maxCell = 16, knownCellSizes = Some(Map(0 -> 120L, 1 -> 10L)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(known === capped)
    // pair mass is LINEAR in the degenerate cell's size: C(16,2) full
    // head + (120-16) members × (4 chain + 1 anchor), never C(120,2)
    val pairs = Dedup.bucketPairs(
      assigned.filter($"cell" === 0)
        .select(lit(0).as("band"), $"cell".as("bucket"),
          $"__id".as("id"), $"__vec".as("pl")),
      maxBucket = 16)
    assert(pairs.count() === (120 + (120 - 16) * 5).toLong)
  }

  test("connected components collapse transitive near-dup chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L && cc(9L) === 1L)
    assert(cc(5L) === 5L && cc(6L) === 5L)
  }

  test("dedupByClusters keeps min-id per cluster and all singletons") {
    val corpus = Seq((1L, "x"), (2L, "x2"), (3L, "x3"), (5L, "y"),
      (6L, "y2"), (7L, "solo")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusters(corpus, "id", pairs)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 5L, 7L))
  }

  test("setSimJoinPrefix equals the brute-force all-pairs join") {
    def brute(th: Double) = {
      val sets = docs.select($"id",
        array_sort(array_distinct(
          graft.functions.TextFunctions.shingles($"text", 3))).as("sh"))
      sets.as("a").crossJoin(sets.as("b"))
        .filter($"a.id" < $"b.id")
        .withColumn("inter",
          size(array_intersect($"a.sh", $"b.sh")).cast("long"))
        .filter($"inter" / (size($"a.sh") + size($"b.sh") - $"inter") >= th)
        .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    }
    val got = Dedup.setSimJoinPrefix(docs, "id", "text",
        shingleK = 3, pNum = 1, pDen = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got === brute(0.5))
    assert(got.contains((1L, 4L)) && got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("setSimJoinPrefix at threshold 1 returns exact-dup pairs only") {
    val got = Dedup.setSimJoinPrefix(docs, "id", "text",
        shingleK = 3, pNum = 1, pDen = 1)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSeq
    assert(got === Seq((1L, 4L, 1.0)))
  }

  test("prefix filter prunes: candidate pairs well under all-pairs on sf0.001") {
    val d = graft.core.Tables.t(spark, sf(), "documents")
    val n = d.count()
    val allPairs = n * (n - 1) / 2
    val cands = Dedup.setSimCandidateCount(d, "doc_id", "text",
      shingleK = 3, pNum = 1, pDen = 2)
    val result = Dedup.setSimJoinPrefix(d, "doc_id", "text",
      shingleK = 3, pNum = 1, pDen = 2).count()
    assert(cands >= result)        // lossless: candidates cover the answer
    assert(cands < allPairs / 10,  // and actually prune
      s"candidates $cands vs all-pairs $allPairs")
  }

  test("setSimJoinPrefix: too-short docs (no shingles) never pair") {
    val tiny = Seq((1L, "one two"), (2L, "one two"), (3L, base),
      (4L, base)).toDF("id", "text")
    val got = Dedup.setSimJoinPrefix(tiny, "id", "text",
        shingleK = 3, pNum = 1, pDen = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // docs 1/2 have < 3 tokens -> empty shingle sets -> excluded
    // (empty sets have no well-defined Jaccard, matching the oracle's
    // len(sh) > 0 guard)
    assert(got === Set((3L, 4L)))
  }

  private lazy val semVecs = Seq(
    // ids < 4 are the seeded centroids (unit axes)
    (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(0f, 0f, 1f, 0f)), (3L, Array(0f, 0f, 0f, 1f)),
    (10L, Array(0.9f, 0.1f, 0f, 0f)),  // cluster 0, dup of 0
    (11L, Array(1f, 0.05f, 0f, 0f)),   // cluster 0, dup of 0 and 10
    (20L, Array(0f, 0.9f, 0.2f, 0f)),  // cluster 1, dup of 1
    (30L, Array(0.6f, 0f, 0.75f, 0f))  // cluster 2, NOT a dup (cos≈0.78)
  ).toDF("vec_id", "embedding")

  test("semanticDedup keeps one representative per within-cluster dup set") {
    val out = Dedup.semanticDedup(semVecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 4)
      .as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 30L))
    assert(out(30L) === 2)      // assigned to the z-axis cluster
    assert(out(0L) === 0 && out(1L) === 1)
  }

  test("semanticDedup drop rule matches the brute-force greedy oracle") {
    val vecs = semVecs.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val cents = vecs.filter(_._1 < 4)
    val cell = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cos(v, cv), -cid) }.max._2 * -1
    }.toMap
    val expected = vecs.map(_._1).filter { id =>
      !vecs.exists { case (oid, ov) =>
        oid < id && cell(oid) == cell(id) &&
          cos(ov, vecs.find(_._1 == id).get._2) >= 0.95
      }
    }.toSet
    val got = Dedup.semanticDedup(semVecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 4)
      .select($"vec_id").as[Long].collect().toSet
    assert(got === expected)
  }

  test("semanticDedup pairs only within clusters: cross-cluster dups survive") {
    // 0/1 are centroids; 10 sits near the 0/1 bisector but lands in
    // cluster 0 (tie-break toward smaller cell is irrelevant here:
    // 0.71 > 0.70); 20 is nearly identical to 10 but tips into
    // cluster 1 — SemDeDup's greedy rule never compares them
    val v = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (10L, Array(0.71f, 0.70f)), (20L, Array(0.70f, 0.71f))
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(v, "vec_id", "embedding",
        threshold = 0.95, nlist = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L, 10L, 20L)) // 10 vs 20: cos≈0.9998 but split
  }

  /** Deterministic pseudo-random corpus for the two-level quantizer
    * pins: 200 vectors in 8 dims, coordinates derived from a hash so
    * the fixture is stable without an RNG. */
  private lazy val twoLevelVecs = {
    val rows = (0L until 200L).map { id =>
      val v = Array.tabulate(8) { d =>
        // xorshift-ish mix, mapped into [-1, 1)
        val h = (id * 2654435761L + d * 40503L + 7L) * 0x9e3779b97f4a7c15L
        ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("semanticDedupTwoLevel with nprobe=ncoarse equals the flat argmax exactly") {
    // exhaustive probing makes every fine centroid a candidate, so the
    // two-level assignment must reproduce the flat path bit-for-bit —
    // same (cos DESC, cell ASC) tie rule, same keeper set. threshold
    // 1.1 keeps every row, turning the output into the raw assignment
    // surface; the second call pins the keeper set at a real threshold.
    val flat = Dedup.semanticDedup(twoLevelVecs, "vec_id", "embedding",
        threshold = 1.1, nlist = 32)
      .as[(Long, Int)].collect().toMap
    val two = Dedup.semanticDedupTwoLevel(twoLevelVecs, "vec_id", "embedding",
        threshold = 1.1, nlist = 32, ncoarse = 8, nprobe = 8)
      .as[(Long, Int)].collect().toMap
    assert(two === flat)
    val flatKept = Dedup.semanticDedup(twoLevelVecs, "vec_id", "embedding",
        threshold = 0.5, nlist = 32)
      .select($"vec_id").as[Long].collect().toSet
    val twoKept = Dedup.semanticDedupTwoLevel(twoLevelVecs, "vec_id",
        "embedding", threshold = 0.5, nlist = 32, ncoarse = 8, nprobe = 8)
      .select($"vec_id").as[Long].collect().toSet
    assert(twoKept === flatKept)
  }

  test("semanticDedupTwoLevel probe-limited assignment stays near the flat argmax") {
    // nprobe=2 of 8 coarse cells: the IVF trade. Agreement is a recall
    // measure, not an identity — the pin is a floor far under the
    // measured rate (~0.9+ on this fixture) so jitter can't flip it.
    val flat = Dedup.semanticDedup(twoLevelVecs, "vec_id", "embedding",
        threshold = 1.1, nlist = 32)
      .as[(Long, Int)].collect().toMap
    val two = Dedup.semanticDedupTwoLevel(twoLevelVecs, "vec_id", "embedding",
        threshold = 1.1, nlist = 32, ncoarse = 8, nprobe = 2)
      .as[(Long, Int)].collect().toMap
    assert(two.keySet === flat.keySet)
    val agree = flat.count { case (id, c) => two(id) == c }
    assert(agree >= (flat.size * 0.75).toInt,
      s"two-level nprobe=2 agreement $agree/${flat.size} below floor")
  }

  /** A CLUSTERED corpus — 256 vectors in 8 dims around 16 well-separated
    * axis-pair prototypes with small deterministic jitter. Real
    * embedding corpora cluster; the near-uniform [[twoLevelVecs]] is
    * the adversarial case for probe selection (all coarse cosines
    * nearly equal). */
  private lazy val clusteredVecs = {
    val rows = (0L until 256L).map { id =>
      // prototype p = id % 16 → unit mass split between axes (p/2) and
      // (p/2+4), sign from p's parity — 16 distinct directions
      val p = (id % 16).toInt
      val base = Array.fill(8)(0f)
      base(p / 2) = 0.8f
      base((p / 2 + 4) % 8) = if (p % 2 == 0) 0.6f else -0.6f
      val v = base.zipWithIndex.map { case (x, d) =>
        val h = (id * 2654435761L + d * 40503L + 13L) * 0x9e3779b97f4a7c15L
        x + ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat * 0.1f
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("semanticDedupTwoLevel probe-limited assignment is near-exact on a clustered corpus") {
    // the production claim: on data that CLUSTERS (what embeddings do),
    // probe-limited coarse selection finds the right cell nearly always
    // — the 200k-near-uniform sweep's 0.54 agreement at nprobe=4/32 is
    // the no-structure worst case, not the operator. nprobe=2 of 8
    // coarse cells here must agree >= 95% with the flat argmax.
    val flat = Dedup.semanticDedup(clusteredVecs, "vec_id", "embedding",
        threshold = 1.1, nlist = 32)
      .as[(Long, Int)].collect().toMap
    val two = Dedup.semanticDedupTwoLevel(clusteredVecs, "vec_id",
        "embedding", threshold = 1.1, nlist = 32, ncoarse = 8, nprobe = 2)
      .as[(Long, Int)].collect().toMap
    val agree = flat.count { case (id, c) => two(id) == c }
    assert(agree >= (flat.size * 0.95).toInt,
      s"clustered-corpus agreement $agree/${flat.size} below 95%")
  }

  test("adaptiveNprobe: early stop on clustered geometry, exhaustive recovery on near-uniform") {
    def fineOf(df: org.apache.spark.sql.DataFrame) = df.filter($"vec_id" < 32)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("cv"))
    // clustered corpus: the coarse probe finds the right cell early —
    // selection must stop BELOW exhaustive while clearing the floor
    val cl = Dedup.adaptiveNprobe(clusteredVecs, "vec_id", "embedding",
      fineOf(clusteredVecs), ncoarse = 8, floor = 0.9, sampleMod = 2)
    info(s"clustered: $cl")
    assert(cl.nprobe < 8 && cl.agreement >= 0.9,
      s"clustered geometry should stop early above the floor: $cl")
    // near-uniform corpus (all coarse cosines close): a high floor
    // forces escalation to the exhaustive probe, where agreement is 1
    // by construction — the r14 0.63-agreement caveat turned lever
    val nu = Dedup.adaptiveNprobe(twoLevelVecs, "vec_id", "embedding",
      fineOf(twoLevelVecs), ncoarse = 8, floor = 0.99, sampleMod = 2)
    info(s"near-uniform: $nu")
    assert(nu.nprobe > 1 && nu.steps > 1,
      s"near-uniform geometry must escalate: $nu")
    assert(nu.agreement >= 0.99, s"floor not reached: $nu")
    // determinism: the sample is hash-derived, the loop replays exactly
    val nu2 = Dedup.adaptiveNprobe(twoLevelVecs, "vec_id", "embedding",
      fineOf(twoLevelVecs), ncoarse = 8, floor = 0.99, sampleMod = 2)
    assert(nu2 === nu)
    // empty sample degrades safely to the exhaustive probe
    val empty = Dedup.adaptiveNprobe(
      twoLevelVecs.filter($"vec_id" < 0), "vec_id", "embedding",
      fineOf(twoLevelVecs), ncoarse = 8, floor = 0.9)
    assert(empty === Dedup.NprobeChoice(8, 1.0, 0))
  }

  test("semanticDedupTwoLevel on the axis fixture: same keepers as flat") {
    val kept = Dedup.semanticDedupTwoLevel(semVecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 4, ncoarse = 2, nprobe = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L, 2L, 3L, 30L))
  }

  test("substringDedup removes cross-doc spans, keeps unique text") {
    // docs 1 & 2 share the 10-token run t1..t10 (> w=4), padded with
    // distinct prefixes/suffixes; doc 3 is unrelated; doc 4 is short
    val shared = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"zeta eta $shared theta iota"),
      (3L, "nothing here repeats across any other document at all"),
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // every window of the shared run is dup (10 - 4 + 1 starts, cover
    // = positions 3..12 in doc 1 / 3..12 in doc 2 → 10 tokens removed)
    assert(out(1L) === ((14L, 10L, "alpha beta gamma delta")))
    assert(out(2L) === ((14L, 10L, "zeta eta theta iota")))
    assert(out(3L) === ((9L, 0L, "nothing here repeats across any other document at all")))
    assert(out(4L) === ((2L, 0L, "tiny doc")))
  }

  test("substringDedup: within-doc repetition alone is not removed") {
    // the repeated run lives in ONE doc only — count(DISTINCT doc) = 1
    val run = (1 to 6).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, s"$run filler $run"),
      (2L, "some other words that never repeat anywhere else")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 0L)
  }

  test("substringDedup: overlapping dup windows merge into one cover") {
    // doc 3 shares t1..t6 with doc 1 and t5..t10 with doc 2: the two
    // covers overlap at t5,t6 and the union (not the sum) is removed
    val a = (1 to 6).map(i => s"t$i").mkString(" ")
    val b = (5 to 10).map(i => s"t$i").mkString(" ")
    val full = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, s"pad1 $a pad2"),
      (2L, s"pad3 $b pad4"),
      (3L, s"lead $full tail")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", w = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out(3L) === ((10L, "lead tail")))
    assert(out(1L) === ((6L, "pad1 pad2")))
    assert(out(2L) === ((6L, "pad3 pad4")))
  }

  test("substringSelfDedup removes later repeats of a within-doc run") {
    val run = (1 to 6).map(i => s"r$i").mkString(" ")
    val df = Seq(
      // run repeats: second occurrence (positions 8..13) removed
      (1L, s"$run filler $run"),
      (2L, "unique words only in this one document here")
    ).toDF("doc_id", "text")
    val out = Dedup.substringSelfDedup(df, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((13L, 6L, s"$run filler")))
    assert(out(2L) === ((8L, 0L,
      "unique words only in this one document here")))
  }

  test("substringSelfDedup collapses a degenerate same-token run") {
    // "a a a ... a" (10 copies), w=4: windows 2..7 are dups of window 1
    // → cover = positions 2..10, leaving only the first token
    val df = Seq((1L, Seq.fill(10)("a").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.substringSelfDedup(df, "doc_id", "text", w = 4).collect()(0)
    assert(out.getLong(1) === 10L)
    assert(out.getLong(2) === 9L)
    assert(out.getString(3) === "a")
  }

  test("dedupByClustersBest keeps the max-score member, ties to min id") {
    // component {1,2,4}: scores 1:0.3, 2:0.9, 4:0.9 → keep 2 (tie min
    // id); 3 is a singleton (no pair) and survives with any score
    val scored = Seq(
      (1L, 0.3), (2L, 0.9), (3L, -5.0), (4L, 0.9)
    ).toDF("id", "sc")
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClustersBest(scored, "id", pairs, $"sc")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("dedupByClustersBest keeps exactly one member when all scores are null") {
    // component {1,2}: both scores null → max(__score) is null; the
    // null-safe winner filter must still elect min-id as keeper rather
    // than silently keeping the whole cluster (the === form produced no
    // winners row → no losers → both kept). A mixed component {3,4}
    // checks null never out-ranks a real score.
    val scored = Seq(
      (1L, Option.empty[Double]), (2L, Option.empty[Double]),
      (3L, Option.empty[Double]), (4L, Some(0.5))
    ).toDF("id", "sc")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClustersBest(scored, "id", pairs, $"sc")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
  }

  test("dedupByClustersBest with a constant score degenerates to min-id") {
    val docs4 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "t")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val best = Dedup.dedupByClustersBest(docs4, "id", pairs, lit(1.0))
      .select($"id").as[Long].collect().toSet
    val minid = Dedup.dedupByClusters(docs4, "id", pairs)
      .select($"id").as[Long].collect().toSet
    assert(best === minid && best === Set(1L, 3L))
  }

  test("substringDedup hashed-gram lever equals the exact form on sf0.001") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    def run(h: Boolean) =
      Dedup.substringDedup(docs, "doc_id", "text", w = 8, hashGrams = h)
        .select($"doc_id", $"n_removed", $"clean_text")
        .as[(Long, Long, String)].collect().toSet
    assert(run(true) === run(false))
  }
}
