package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property check for the candidate-generation primitive every LSH
  * operator shares (d2/d2b/d2d/d3b): bucketPairs must emit exactly the
  * distinct in-bucket unordered pairs a naive self-join would — the
  * whole point of the formulation is evaluating the expensive signature
  * lineage once, so its pair semantics must be provably identical.
  * Contract: one row per (band, id) with that id's bucket (posexplode
  * output) — the generator dedups triples accordingly. */
object DedupProps extends Properties("dedup") {

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

  private val genRow: Gen[(Int, Int, Long)] = for {
    band <- Gen.choose(0, 2)
    bucket <- Gen.choose(0, 3)
    id <- Gen.choose(0L, 9L)
  } yield (band, bucket, id)

  property("bucketPairs == brute-force distinct in-bucket pairs") =
    forAll(Gen.listOfN(25, genRow)) { raw =>
      import spark.implicits._
      // one bucket per (band, id): keep the first occurrence
      val rows = raw.groupBy(r => (r._1, r._3)).values.map(_.head).toList
      val df = rows.toDF("band", "bucket", "id").withColumn("pl", lit(0))
      val got = Dedup.bucketPairs(df)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = rows.groupBy(r => (r._1, r._2)).values.flatMap { grp =>
        val ids = grp.map(_._3).sorted
        for { i <- ids; j <- ids if i < j } yield (i, j)
      }.toSet
      got == want
    }

  /** The skew cap's contract: capped pairs are a SUBSET of the full
    * expansion with identical candidate-graph connectivity — every
    * bucket's member set stays one connected component, so downstream
    * connected-components dedup sees the same components. (Verified
    * pair-level recall can still drop inside a capped bucket; that is
    * the documented ranking trade-off, not a connectivity loss.) */
  property("capped bucketPairs: subset of full pairs, same components") =
    forAll(Gen.listOfN(40, genRow), Gen.choose(2, 6), Gen.choose(1, 3)) {
      (raw, maxBucket, cwRaw) =>
        import spark.implicits._
        val chainWidth = math.min(cwRaw, maxBucket - 1)
        val rows = raw.groupBy(r => (r._1, r._3)).values.map(_.head).toList
        val df = rows.toDF("band", "bucket", "id").withColumn("pl", lit(0))
        val full = Dedup.bucketPairs(df)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        val capped = Dedup.bucketPairs(df, maxBucket, chainWidth)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet

        def components(pairs: Set[(Long, Long)]): Map[Long, Long] = {
          val parent = scala.collection.mutable.Map[Long, Long]()
          def find(x: Long): Long = {
            val p = parent.getOrElseUpdate(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          pairs.foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          parent.keys.map(k => k -> find(k)).toMap
        }

        capped.subsetOf(full) &&
          components(capped) == components(full)
    }

  /** Star contraction must label exactly like min-label propagation on
    * arbitrary pair sets (both return component = min id). */
  property("connectedComponentsStar == min-label labels") =
    forAll(Gen.listOfN(12, for {
      a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) if a != b
    } yield (a, b))) { edges =>
      import spark.implicits._
      edges.isEmpty || {
        val pairs = edges.toDF("id_a", "id_b")
        val minLabel = Dedup.connectedComponents(pairs)
          .as[(Long, Long)].collect().toMap
        val star = Dedup.connectedComponentsStar(pairs)
          .as[(Long, Long)].collect().toMap
        star == minLabel
      }
    }

  /** The long-path case the star variant exists for: a 24-hop chain.
    * Min-label moves the min ONE hop per round (~diameter rounds);
    * star contraction halves tree height per round (~log d). Labels
    * must agree exactly; the star round count must be strictly
    * smaller — that's the 100 TB argument (a deep near-dup chain costs
    * log-many shuffles, not diameter-many). */
  property("star CC: identical labels on a long path, strictly fewer rounds") = {
    import spark.implicits._
    val n = 24
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (mlDf, mlRounds) = Dedup.ccMinLabelWithRounds(pairs, maxIter = 64)
    val (stDf, stRounds) = Dedup.ccStarWithRounds(pairs, maxIter = 64)
    val ml = mlDf.as[(Long, Long)].collect().toMap
    val st = stDf.as[(Long, Long)].collect().toMap
    val allZero = (0L to n).forall(i => st.getOrElse(i, -1L) == 0L)
    st == ml && allZero && stRounds < mlRounds
  }

  /** The adaptive default must label identically on BOTH of its paths:
    * shallow inputs (min-label converges before the switch) and a deep
    * chain (escalates to star contraction past switchDepth). */
  property("adaptive CC == min-label labels on shallow and deep inputs") = {
    import spark.implicits._
    val shallow = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val deep = (0L until 24L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Seq(shallow, deep).forall { pairs =>
      Dedup.connectedComponentsAdaptive(pairs)
        .as[(Long, Long)].collect().toMap ==
        Dedup.connectedComponents(pairs, maxIter = 64)
          .as[(Long, Long)].collect().toMap
    }
  }

  /** The exact double-fold Kernels.cosine computes (same accumulation
    * order), so argmax ties and threshold boundaries agree bit for
    * bit with the distributed path. */
  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    var na = 0.0; i = 0
    while (i < a.length) { val x = a(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0; i = 0
    while (i < b.length) { val y = b(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** SemDeDup semantics for ANY corpus/nlist/threshold: assignment is
    * argmax cosine over the id<nlist centroids (ties to the smaller
    * cell), a point drops iff a lower-id same-cluster point sits at
    * cos >= threshold, keepers carry their cell. Integer-grid vectors
    * make exact ties common — the property covers the tie-break path,
    * not just generic positions. */
  property("semanticDedup == greedy within-cluster oracle for any corpus") =
    forAll(Gen.choose(1, 18), Gen.choose(2, 6),
        Gen.oneOf(0.5, 0.8, 0.95), Gen.choose(0L, 9999L)) {
      (n, nlist, thr, seed) =>
        import spark.implicits._
        val rnd = new scala.util.Random(seed)
        val vecs = (0L until n.toLong).map { i =>
          val v = Seq.fill(4)((rnd.nextInt(5) - 2).toFloat)
          (i, if (v.exists(_ != 0f)) v else Seq(1f, 0f, 0f, 0f))
        }
        val cents = vecs.filter(_._1 < nlist)
        val cell = vecs.map { case (id, v) =>
          id -> -cents.map { case (cid, cv) => (cosRef(v, cv), -cid) }.max._2
        }.toMap
        val expected = vecs.collect {
          case (id, v) if !vecs.exists { case (oid, ov) =>
            oid < id && cell(oid) == cell(id) && cosRef(ov, v) >= thr
          } => id -> cell(id).toInt
        }.toMap
        val got = Dedup.semanticDedup(
            vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
            threshold = thr, nlist = nlist)
          .as[(Long, Int)].collect().toMap
        got == expected
    }

  /** JVM reference for the span-removal family: windows, dup rule,
    * cover union, reconstruction — shared by the cross-doc and
    * within-doc properties below (`crossDoc` flips the dup rule). */
  private def refSpans(
      docs: Seq[(Long, Seq[String])], w: Int, crossDoc: Boolean)
      : Map[Long, (Long, Long, String)] = {
    val wins = docs.flatMap { case (id, ts) =>
      if (ts.length < w) Nil
      else (0 to ts.length - w).map(i => (id, i + 1, ts.slice(i, i + w).mkString(" ")))
    }
    val dupOf: ((Long, Int, String)) => Boolean =
      if (crossDoc) {
        val dupGrams = wins.groupBy(_._3)
          .filter(_._2.map(_._1).distinct.size >= 2).keySet
        x => dupGrams(x._3)
      } else {
        val firsts = wins.groupBy(x => (x._1, x._3))
          .map { case (k, v) => k -> v.map(_._2).min }
        x => x._2 > firsts((x._1, x._3))
      }
    docs.map { case (id, ts) =>
      val cov = wins.filter(x => x._1 == id && dupOf(x))
        .flatMap(x => x._2 to (x._2 + w - 1)).toSet
      val keep = (1 to ts.length).filterNot(cov).map(p => ts(p - 1))
      id -> ((ts.length.toLong, cov.size.toLong, keep.mkString(" ")))
    }.toMap
  }

  private val genCorpus: Gen[List[List[String]]] =
    Gen.choose(2, 5).flatMap(n => Gen.listOfN(n,
      Gen.choose(0, 14).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, 5).map(i => s"w$i")))))

  property("substringDedup == reference cover/reconstruction for any corpus") =
    forAll(genCorpus, Gen.choose(2, 4)) { (corpus, w) =>
      import spark.implicits._
      val docs = corpus.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.substringDedup(df, "doc_id", "text", w)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      got == refSpans(docs, w, crossDoc = true)
    }

  property("substringSelfDedup == reference keep-first for any corpus") =
    forAll(genCorpus, Gen.choose(2, 4)) { (corpus, w) =>
      import spark.implicits._
      val docs = corpus.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.substringSelfDedup(df, "doc_id", "text", w)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      got == refSpans(docs, w, crossDoc = false)
    }
}
