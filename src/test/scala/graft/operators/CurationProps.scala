package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property checks for the chunking and funnel operators.
  *
  * Chunking invariant — REASSEMBLY: dropping each non-first chunk's
  * leading `overlap` characters and concatenating in chunk order must
  * reproduce the original document exactly (no character lost at any
  * window boundary, none duplicated beyond the declared overlap) for
  * ANY (text, chunk, overlap) combination. This is the property a
  * training pipeline silently depends on: a off-by-one in the window
  * arithmetic corrupts every document longer than one chunk.
  *
  * Funnel invariant — MONOTONICITY + PERMUTATION SAFETY: step counts
  * never increase down the funnel, step 1 equals the distinct users
  * with that event type, and the result is invariant under input row
  * order (min-chain semantics depend only on the event SET).
  */
object CurationProps extends Properties("curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genDocs: Gen[List[String]] = Gen.listOfN(6,
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))

  property("chunks reassemble to the original document") =
    forAll(genDocs, Gen.choose(2, 12), Gen.choose(0, 1)) {
      (texts, chunk, overlapPick) =>
        val overlap = math.min(overlapPick * (chunk / 2), chunk - 1)
        import spark.implicits._
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val out = Curation.chunkDocuments(docs, "doc_id", "text", chunk, overlap)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
          .groupBy(_._1)
        texts.zipWithIndex.forall { case (t, i) =>
          val chunks = out.getOrElse(i.toLong, Array.empty)
            .sortBy(_._2).map(_._3)
          val rebuilt = chunks.zipWithIndex.map {
            case (c, 0) => c
            case (c, _) => c.drop(overlap)
          }.mkString
          rebuilt == t
        }
    }

  private val genEvents: Gen[List[(Long, String, Long)]] = Gen.listOf(for {
    u <- Gen.choose(0L, 5L)
    et <- Gen.oneOf("a", "b", "c")
    t <- Gen.choose(0L, 50L)
  } yield (u, et, t))

  property("funnel counts are monotone and row-order-invariant") =
    forAll(genEvents) { evs =>
      import spark.implicits._
      def run(rows: List[(Long, String, Long)]): Seq[Long] = {
        val df = rows.map { case (u, et, t) =>
          (u, et, new java.sql.Timestamp(1704067200000L + t * 1000L))
        }.toDF("u", "et", "t")
        Funnel.funnelCounts(df, "u", "et", "t", Seq("a", "b", "c"))
          .orderBy(col("step_no")).select(col("users"))
          .as[Long].collect().toSeq
      }
      val counts = run(evs)
      val shuffled = run(new scala.util.Random(7).shuffle(evs))
      val firstExact = counts.head ==
        evs.filter(_._2 == "a").map(_._1).distinct.size.toLong
      counts.zip(counts.tail).forall { case (a, b) => a >= b } &&
        firstExact && counts == shuffled
    }

  // Negative-pair invariants: the pairing is a pure function of the ID
  // SET and the seed — independent of input row order and of any other
  // column — every id pairs with at most k partners, and never itself.
  property("negativePairs: order-invariant, self-free, k-bounded") =
    forAll(Gen.choose(5, 60), Gen.choose(1, 4), Gen.choose(0L, 99L)) {
      (n, k, seed) =>
        import spark.implicits._
        val ids = (0 until n).map(i => i.toLong * 17 + 3)
        def pairs(xs: Seq[Long]) =
          Curation.negativePairs(xs.toDF("id"), "id", k, seed)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val p = pairs(ids)
        val pShuffled = pairs(new scala.util.Random(seed).shuffle(ids))
        p == pShuffled &&
          p.forall { case (a, b) => a != b } &&
          p.groupBy(_._1).values.forall(_.size <= k)
    }

  // Overlap-join invariant: the grid formulation equals the naive
  // theta join for ANY interval set and ANY grid width — each
  // overlapping pair exactly once, with the exact overlap window.
  property("overlapJoin ≡ naive theta join at any grid width") =
    forAll(Gen.choose(2, 30), Gen.choose(1L, 500L), Gen.choose(0L, 99L)) {
      (n, gridSec, seed) =>
        import spark.implicits._
        val rnd = new scala.util.Random(seed)
        val base = 1704067200000000L
        val iv = (0 until n).map { i =>
          val s = base + rnd.nextInt(172800).toLong * 1000000L
          val len = (1L + rnd.nextInt(36000).toLong) * 1000000L
          (i.toLong, new java.sql.Timestamp(s / 1000),
            new java.sql.Timestamp((s + len) / 1000))
        }.toDF("id", "s", "e")
        val naive = iv.as("a").crossJoin(iv.as("b"))
          .filter(col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
          .select(col("a.id"), col("b.id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = Intervals.overlapJoin(iv, iv, "id", "id", "s", "e",
            gridSec * 1000000L)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        got.length == got.toSet.size && got.toSet == naive
    }

  // Quality-scorer invariant: the distributed HOF fold equals a JVM
  // reference recomputation (md5 first byte -> Knuth weight -> ordered
  // left-fold mean) for ANY ascii text, including token-free ones.
  private def refScore(text: String): Double = {
    val words = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    if (words.isEmpty) 0.0
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      words.map { w =>
        val b = md.digest(w.getBytes("UTF-8"))(0) & 0xff
        ((b.toLong * 2654435761L + 104729L) % 2001L).toDouble / 1000.0 - 1.0
      }.foldLeft(0.0)(_ + _) / words.size
    }
  }

  private val genText: Gen[String] = Gen.listOfN(30, Gen.frequency(
    6 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
    1 -> Gen.oneOf('.', ',', '!', '-', '_', '"'),
    1 -> Gen.const('\n'))).map(_.mkString)

  property("hashedQualityScore == JVM reference for any text") =
    forAll(Gen.listOfN(10, genText)) { texts =>
      import spark.implicits._
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), Curation.hashedQualityScore(col("text")).as("s"))
        .as[(Long, Double)].collect().toMap
      texts.zipWithIndex.forall { case (t, i) => got(i.toLong) == refScore(t) }
    }
}
