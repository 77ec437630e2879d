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
}
