package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property checks for the MERGE apply and the drift report.
  *
  * MERGE invariants: applying a change batch is IDEMPOTENT (the result
  * is a fixed point of the same batch — latest-change-wins plus
  * whole-row replacement make a second application a no-op) and
  * INPUT-ROW-ORDER INVARIANT (the winner depends only on (ts, tie),
  * never on arrival order). Both are what make a replayed/duplicated
  * CDC feed safe — the production property.
  *
  * Drift invariant: swapping the two samples preserves the per-bin
  * report (counts swap columns) and BOTH statistics — the chi² term
  * and the PSI summand (p_a−p_b)·ln(p_a/p_b) are symmetric under the
  * swap (each factor flips sign).
  */
object MergeProps extends Properties("merge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genRows = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c", "d", "e", "f")
      t <- Gen.choose(0L, 5L)
      v <- Gen.choose(0, 999)
      op <- Gen.frequency(3 -> "U", 1 -> "D")
    } yield (k, new java.sql.Timestamp(1704067200000L + t * 3600000L),
      v.toDouble, op))
    // UNIQUE tie-break ids: a duplicate (key, ts, cid) would make the
    // winner legitimately nondeterministic (the operator's documented
    // precondition is a disambiguating tieBreak) and the property flaky
  } yield rows.zipWithIndex.map { case ((k, t, v, op), i) =>
    (k, t, v, op, i.toLong)
  }

  private def snapshot(rows: Seq[(String, java.sql.Timestamp, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "ts", "v")
  }

  property("applyChanges is idempotent and row-order invariant") =
    forAll(genRows, Gen.choose(0L, 99L)) { (changes, seed) =>
      import spark.implicits._
      val base = snapshot(Seq(
        ("a", new java.sql.Timestamp(1704000000000L), 1.0),
        ("c", new java.sql.Timestamp(1704000000000L), 3.0),
        ("z", new java.sql.Timestamp(1704000000000L), 26.0)))
      def apply(b: org.apache.spark.sql.DataFrame,
          ch: Seq[(String, java.sql.Timestamp, Double, String, Long)]) =
        Merge.applyChanges(b,
          ch.toDF("k", "ts", "v", "op", "cid"),
          "k", "ts", "op", tieBreak = Seq("cid"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet
      val once = apply(base, changes)
      val onceRows = rows(once)
      // order invariance
      val shuffled = rows(apply(base,
        new scala.util.Random(seed).shuffle(changes)))
      // idempotence: re-apply the same batch to the result
      val twiceRows =
        if (changes.isEmpty) onceRows
        else rows(apply(snapshot(onceRows.toSeq), changes))
      onceRows == shuffled && twiceRows == onceRows
    }

  property("driftReport is symmetric under sample swap") =
    forAll(Gen.choose(1, 50), Gen.choose(1, 50), Gen.choose(0L, 99L)) {
      (na, nb, seed) =>
        import spark.implicits._
        val rnd = new scala.util.Random(seed)
        val a = Seq.fill(na)(rnd.nextInt(600).toLong).toDF("x")
        val b = Seq.fill(nb)(rnd.nextInt(600).toLong).toDF("x")
        val bounds = Seq(100L, 250L, 400L)
        def rep(x: org.apache.spark.sql.DataFrame,
            y: org.apache.spark.sql.DataFrame) =
          Stats.driftReport(x, y, "x", bounds).orderBy("bin_id")
            .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
              r.getDouble(3), r.getBoolean(4)))
        val fwd = rep(a, b)
        val rev = rep(b, a)
        fwd.map { case (bin, n1, n2, chi, d) => (bin, n2, n1, chi, d) }
          .toSeq == rev.toSeq
    }
}
