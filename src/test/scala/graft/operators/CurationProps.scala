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
}
