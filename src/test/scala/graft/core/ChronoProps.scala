package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5): range-scan equivalence to a
  * brute-force filter, and flush transparency — querying after one bulk
  * insert equals querying after the same rows split across inserts (the
  * reference's memtable/tablet transparency, table.go:132-162). */
object ChronoProps extends Properties("chrono") {

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

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private val genRow: Gen[ChronoRow] = for {
    key <- Gen.alphaLowerStr.map(_.take(4)).suchThat(_.nonEmpty)
    offMin <- Gen.choose(0L, 60L * 24 * 3) // 3 days of minutes
  } yield ChronoRow(key, new Timestamp(base + offMin * 60000L), Array[Byte](1))

  private val genRows: Gen[List[ChronoRow]] = Gen.listOfN(30, genRow)

  private val genRange: Gen[(Timestamp, Timestamp)] = for {
    a <- Gen.choose(0L, 60L * 24 * 3)
    b <- Gen.choose(a, 60L * 24 * 3)
  } yield (new Timestamp(base + a * 60000L), new Timestamp(base + b * 60000L))

  property("rangeQuery == brute-force inclusive filter") =
    forAll(genRows, genRange) { case (rows, (s, e)) =>
      val db = new ChronoDB(spark,
        ChronoConfig(Files.createTempDirectory("prop1").toString))
      db.createTable("t")
      db.insertSeq("t", rows)
      val got = db.query("t", s, e).collect()
        .map(r => (r.getString(0), r.getTimestamp(1))).sorted.toSeq
      val want = rows.filter(r => !r.ts.before(s) && !r.ts.after(e))
        .map(r => (r.key, r.ts)).sorted
      got == want
    }

  property("deleteWhere == brute-force complement; sidecars stay consistent") =
    forAll(genRows, genRange) { case (rows, (s, e)) =>
      import org.apache.spark.sql.functions.{col, lit}
      val db = new ChronoDB(spark,
        ChronoConfig(Files.createTempDirectory("propdel").toString))
      try {
        db.createTable("t")
        db.insertSeq("t", rows)
        // predicate mixes the time axis and a key shape — both rewrite
        // paths (emptied buckets + survivor rewrites) get exercised as
        // the random range slides
        val cond = col("ts") >= lit(s) && col("ts") <= lit(e) &&
          col("key") >= lit("g")
        val doomed = rows.count(r =>
          !r.ts.before(s) && !r.ts.after(e) && r.key >= "g")
        val deleted = db.deleteWhere("t", cond)
        val got = db.table("t").collect()
          .map(r => (r.getString(0), r.getTimestamp(1))).sorted.toSeq
        val want = rows.filterNot(r =>
          !r.ts.before(s) && !r.ts.after(e) && r.key >= "g")
          .map(r => (r.key, r.ts)).sorted
        deleted == doomed && got == want && db.sidecarsConsistent("t")
      } finally db.close()
    }

  property("updateWhere == brute-force CASE; moved-ts rows re-bucket") =
    forAll(genRows, genRange) { case (rows, (s, e)) =>
      import org.apache.spark.sql.functions.{col, expr, lit}
      val db = new ChronoDB(spark,
        ChronoConfig(Files.createTempDirectory("propupd").toString))
      try {
        db.createTable("t")
        db.insertSeq("t", rows)
        val cond = col("ts") >= lit(s) && col("ts") <= lit(e)
        // move hit rows 10 days forward — every hit crosses into a
        // bucket OUTSIDE the affected set (the re-bucket insert path)
        val updated = db.updateWhere("t",
          Seq("ts" -> (col("ts") + expr("INTERVAL 10 DAYS"))), cond)
        val hit = rows.count(r => !r.ts.before(s) && !r.ts.after(e))
        val got = db.table("t").collect()
          .map(r => (r.getString(0), r.getTimestamp(1))).sorted.toSeq
        val want = rows.map { r =>
          if (!r.ts.before(s) && !r.ts.after(e))
            (r.key, new Timestamp(r.ts.getTime + 10L * 86400000L))
          else (r.key, r.ts)
        }.sorted
        updated == hit && got == want && db.sidecarsConsistent("t")
      } finally db.close()
    }

  property("asOf == brute-force argmax over t' <= t") = {
    import spark.implicits._
    val genKT: Gen[(Long, Long)] = for {
      k <- Gen.choose(1L, 4L)
      m <- Gen.choose(0L, 500L)
    } yield (k, m)
    val genLeft = Gen.listOfN(20, genKT)
    val genRight = Gen.listOfN(20, genKT)
    forAll(genLeft, genRight) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, m), i) => (i.toLong, k, new Timestamp(base + m * 60000L)) }
        .toDF("lid", "k", "t")
      val right = rs.zipWithIndex
        .map { case ((k, m), i) => (i.toLong, k, new Timestamp(base + m * 60000L), i * 10.0) }
        .toDF("seq", "k", "t", "v")
      val got = graft.operators.AsOfJoin.asOf(left, right, "k", "t", "k", "t",
          Seq("v" -> "last_v"), rightTieBreak = Some("seq"))
        .select("lid", "last_v").as[(Long, Option[Double])].collect().toMap
      val want = ls.zipWithIndex.map { case ((k, m), i) =>
        val cands = rs.zipWithIndex.filter { case ((rk, rm), _) => rk == k && rm <= m }
        i.toLong -> (if (cands.isEmpty) None
          else Some(cands.maxBy { case ((_, rm), ri) => (rm, ri) }._2 * 10.0))
      }.toMap
      got == want
    }
  }

  /** The observe-built sidecar must satisfy three invariants under ANY
    * insert split: (1) the consistency anchors hold (per-bucket n and
    * CMS depth-0 mass equal the data's counts — the check the insert
    * partial-failure detector relies on); (2) the sketch answer is
    * insert-split-INVARIANT (per-batch rows merge losslessly, the
    * memtable-transparency argument applied to stats); (3) at fixture
    * cardinality (≤ 30 distinct short keys) the lgK=12 HLL is still in
    * its exact sparse regime, so the range-distinct answer must EQUAL
    * the brute-force distinct count over the bucket-widened range. */
  property("sidecar invariants: consistent, split-invariant, exact at small cardinality") =
    forAll(genRows, Gen.choose(0, 30), genRange) {
      case (rows, splitAt, (s, e)) =>
        val db1 = new ChronoDB(spark,
          ChronoConfig(Files.createTempDirectory("prop3a").toString))
        val db2 = new ChronoDB(spark,
          ChronoConfig(Files.createTempDirectory("prop3b").toString))
        db1.createTable("t"); db2.createTable("t")
        db1.insertSeq("t", rows)
        val (h, t2) = rows.splitAt(math.min(splitAt, rows.length))
        if (h.nonEmpty) db2.insertSeq("t", h)
        if (t2.nonEmpty) db2.insertSeq("t", t2)
        // approxDistinctKeys widens to whole UTC-hour buckets; the
        // brute-force twin floors instants to UTC hours (no-DST zone, so
        // label arithmetic == epoch-hour arithmetic)
        def hb(t: Timestamp) = Math.floorDiv(t.getTime, 3600000L)
        val exact = rows.filter(r => hb(r.ts) >= hb(s) && hb(r.ts) <= hb(e))
          .map(_.key).distinct.size.toLong
        db1.sidecarsConsistent("t") && db2.sidecarsConsistent("t") &&
          db1.approxDistinctKeys("t", s, e) == exact &&
          db2.approxDistinctKeys("t", s, e) == exact
    }

  property("flush transparency: one insert == split inserts") =
    forAll(genRows, Gen.choose(0, 30), genRange) {
      case (rows, splitAt, (s, e)) =>
        val db1 = new ChronoDB(spark,
          ChronoConfig(Files.createTempDirectory("prop2a").toString))
        val db2 = new ChronoDB(spark,
          ChronoConfig(Files.createTempDirectory("prop2b").toString))
        db1.createTable("t"); db2.createTable("t")
        db1.insertSeq("t", rows)
        val (h, t2) = rows.splitAt(math.min(splitAt, rows.length))
        if (h.nonEmpty) db2.insertSeq("t", h)
        if (t2.nonEmpty) db2.insertSeq("t", t2)
        def res(db: ChronoDB) = db.query("t", s, e).collect()
          .map(r => (r.getString(0), r.getTimestamp(1))).sorted.toSeq
        res(db1) == res(db2)
    }

  property("history: tableAsOf matches a brute-force model at EVERY version; change feed is the model's bag diff") =
    forAll(genRows, genRows, genRange) { case (r1, r2, (s, e)) =>
      import org.apache.spark.sql.functions.{col, lit}
      val db = new ChronoDB(spark,
        ChronoConfig(Files.createTempDirectory("prophist").toString,
          trashGraceMs = 3600000L))
      try {
        db.createTable("t")
        def bag(rows: Seq[(String, Timestamp)]): Seq[(String, Long)] =
          rows.map { case (k, t) => (k, t.getTime) }.sorted
        db.insertSeq("t", r1)                                   // v1
        db.insertSeq("t", r2)                                   // v2
        val m1 = r1.map(r => (r.key, r.ts))
        val m2 = m1 ++ r2.map(r => (r.key, r.ts))
        val doomed = m2.filter { case (_, t) => !t.before(s) && !t.after(e) }
        val deleted = db.deleteWhere("t",
          col("ts") >= lit(s) && col("ts") <= lit(e))           // v3 if > 0
        val m3 = m2.filterNot { case (_, t) => !t.before(s) && !t.after(e) }
        val models = Seq(0L -> Seq.empty[(String, Timestamp)], 1L -> m1,
          2L -> m2) ++ (if (deleted > 0) Seq(3L -> m3) else Nil)
        def snapBag(v: Long): Seq[(String, Long)] =
          db.tableAsOf("t", v).collect()
            .map(r => (r.getString(0), r.getTimestamp(1).getTime))
            .sorted.toSeq
        def feedBag(f: Long, t: Long): Seq[(String, Long, String)] =
          db.changesBetween("t", f, t).collect()
            .map(r => (r.getString(0), r.getTimestamp(1).getTime,
              r.getAs[String]("_change_type"))).sorted.toSeq
        val snapsOk = models.forall { case (v, m) => snapBag(v) == bag(m) }
        val feed12 = feedBag(1, 2) ==
          r2.map(r => (r.key, r.ts.getTime, "insert")).sorted
        val feed23 = deleted == 0 || feedBag(2, 3) ==
          doomed.map { case (k, t) => (k, t.getTime, "delete") }.sorted
        val head = db.history("t").head.version
        snapsOk && feed12 && feed23 && deleted == doomed.size &&
          head == (if (deleted > 0) 3L else 2L)
      } finally db.close()
    }

  property("restoreVersion round-trips: the live table equals the model at every restored version, any order") =
    forAll(genRows, genRows, genRange) { case (r1, r2, (s, e)) =>
      import org.apache.spark.sql.functions.{col, lit}
      val db = new ChronoDB(spark,
        ChronoConfig(Files.createTempDirectory("proprest").toString,
          trashGraceMs = 3600000L))
      try {
        db.createTable("t")
        db.insertSeq("t", r1)                                   // v1
        db.insertSeq("t", r2)                                   // v2
        val m1 = r1.map(r => (r.key, r.ts.getTime)).sorted
        val m2 = (m1 ++ r2.map(r => (r.key, r.ts.getTime))).sorted
        val deleted = db.deleteWhere("t",
          col("ts") >= lit(s) && col("ts") <= lit(e))           // v3 if > 0
        val m3 = (r1 ++ r2).filterNot(r =>
            !r.ts.before(s) && !r.ts.after(e))
          .map(r => (r.key, r.ts.getTime)).sorted
        val models: Seq[(Long, Seq[(String, Long)])] =
          Seq(1L -> m1, 2L -> m2) ++ (if (deleted > 0) Seq(3L -> m3) else Nil)
        def live(): Seq[(String, Long)] = db.table("t").collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime))
          .sorted.toSeq
        // restore in a deliberately non-monotone order: back to v1,
        // forward to the last, back to v2 — every hop must land the
        // model's state with consistent sidecars, and each restore is
        // itself a commit (history stays linear)
        val order = Seq(models.head, models.last) ++ models.take(2).tail
        var restores = 0
        val hopsOk = order.forall { case (v, m) =>
          if (db.restoreVersion("t", v) > 0) restores += 1
          live() == m && db.manifestConsistent("t") &&
            db.sidecarsConsistent("t")
        }
        val verbs = db.history("t").map(_.verb)
        hopsOk && verbs.take(restores).forall(_ == "restore")
      } finally db.close()
    }
}
