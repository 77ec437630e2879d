package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Native-expression kernels: correctness AND codegen health.
  *
  * The codegen tests run with spark.sql.codegen.fallback=false so a
  * Janino compile failure in generated code FAILS the test instead of
  * silently falling back to interpreted execution (which is what
  * happened in round 1: a nested-object reference the generated code
  * could not resolve cost ~5× on the d2/d3 bench paths).
  */
class NativeExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def withCodegenStrict[A](f: => A): A = {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f
    finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  private lazy val vecs = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(1f, 0f), Seq(0f, 1f))
  ).toDF("a", "b")

  test("cosineNative compiles under strict codegen and matches the HOF formulation") {
    withCodegenStrict {
      val native = vecs
        .select(NativeExpressions.cosineNative(col("a"), col("b")).as("c"))
        .as[Option[Double]].collect()
      val hof = vecs
        .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
        .as[Option[Double]].collect()
      assert(native.toSeq === hof.toSeq)
      assert(native(0).exists(v => math.abs(v - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15))
      assert(native(1) === Some(0.0))
    }
  }

  test("cosineNative inside a wider projection stays in whole-stage codegen") {
    withCodegenStrict {
      val out = vecs
        .select(
          (NativeExpressions.cosineNative(col("a"), col("b")) * 2.0 + 1.0).as("c"),
          size(col("a")).as("n"))
        .where(col("n") > 0)
        .as[(Double, Int)].collect()
      assert(out.length === 2)
    }
  }

  test("cosineNative: zero vector and length mismatch both yield null (like HOF + oracle)") {
    val edge = Seq(
      (Seq(0f, 0f), Seq(1f, 1f)),   // zero norm
      (Seq(1f, 2f), Seq(1f, 2f, 3f)) // length mismatch
    ).toDF("a", "b")
    val native = edge.select(NativeExpressions.cosineNative(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(native.toSeq === Seq(None, None))
    val hof = edge.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(hof.toSeq === Seq(None, None))
  }

  test("minhash signature: identical texts agree on every hash; disjoint texts on none") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog"),
      ("alpha beta gamma delta epsilon zeta", "one two three four five six seven")
    ).toDF("x", "y")
    val out = df.select(
      NativeExpressions.minhashSig(col("x"), 3, 32).as("sx"),
      NativeExpressions.minhashSig(col("y"), 3, 32).as("sy"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(out(0)._1 === out(0)._2)
    assert(out(1)._1.zip(out(1)._2).count { case (a, b) => a == b } === 0)
  }

  test("simhash64: identical texts identical; near-identical texts within small hamming distance") {
    val df = Seq(
      ("spark makes distributed data processing simple and fast for everyone",
       "spark makes distributed data processing simple and fast for everyone"),
      ("spark makes distributed data processing simple and fast for everyone",
       "spark makes distributed data processing simple and quick for everyone")
    ).toDF("x", "y")
    val out = df.select(
      NativeExpressions.simhash64(col("x")).as("hx"),
      NativeExpressions.simhash64(col("y")).as("hy"))
      .as[(Long, Long)].collect()
    assert(out(0)._1 === out(0)._2)
    val hamming = java.lang.Long.bitCount(out(1)._1 ^ out(1)._2)
    assert(hamming <= 16, s"near-duplicate texts should have small hamming distance, got $hamming")
  }

  test("simhash64 pins the portable token-hash definition (oracle SQL depends on it)") {
    // For a single-token document every bit count is ±1 directly from
    // the token hash, so simhash64(doc) == portableTokenHash(token).
    // These values are hand-computed from the documented definition
    // (h1 = poly-131 mod 2^31-1, h2 = poly-137 mod 2^31-19, (h1<<31)|h2);
    // the d2b DuckDB oracle hardcodes the same constants — if this test
    // breaks, that oracle SQL is stale too.
    assert(NativeExpressions.portableTokenHash("abc") === 3602519785471110L)
    assert(NativeExpressions.portableTokenHash("hello") === 1701119645916901935L)
    val out = Seq("abc", "HELLO!").toDF("x")
      .select(NativeExpressions.simhash64(col("x"))).as[Long].collect()
    assert(out(0) === 3602519785471110L)
    assert(out(1) === 1701119645916901935L) // lowercased, '!' stripped by tokenizer
  }

  test("hyperplane signature is deterministic and separates opposite vectors") {
    val df = Seq(
      (Seq(1f, 2f, 3f, 4f), Seq(-1f, -2f, -3f, -4f))
    ).toDF("v", "w")
    val out = df.select(
      NativeExpressions.hyperplaneSig(col("v"), 16, 42).as("sv"),
      NativeExpressions.hyperplaneSig(col("w"), 16, 42).as("sw"))
      .as[(Seq[Int], Seq[Int])].collect()
    // opposite vectors flip every hyperplane sign (dot products negate);
    // ties at exactly 0 would break this but the fixture avoids them
    assert(out(0)._1.zip(out(0)._2).forall { case (a, b) => a != b })
    val again = df.select(NativeExpressions.hyperplaneSig(col("v"), 16, 42))
      .as[Seq[Int]].head()
    assert(again === out(0)._1)
  }

  test("shingleJaccardNative matches a hand-computed jaccard") {
    val df = Seq(("a b c d", "b c d e")).toDF("x", "y")
    // 2-shingles: {ab,bc,cd} vs {bc,cd,de} → inter 2, union 4 → 0.5
    val j = df.select(NativeExpressions.shingleJaccardNative(col("x"), col("y"), 2))
      .as[Double].head()
    assert(j === 0.5)
  }

  test("ngramsExplode generates tokenizer-aligned n-grams") {
    val df = Seq("The quick, QUICK fox!", "", "one").toDF("s")
    val out = df.select(col("s"), NativeExpressions.ngramsExplode(col("s"), 2))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq === Seq(
      ("The quick, QUICK fox!", 0, "the quick"),
      ("The quick, QUICK fox!", 1, "quick quick"),
      ("The quick, QUICK fox!", 2, "quick fox")))
  }

  test("sortedJaccard over shingleHashes equals string-set shingleJaccard") {
    // The d2 verify stage computes Jaccard over pre-hashed sorted shingle
    // sets; the DuckDB oracle recomputes it over string shingle sets. Pin
    // the two formulations equal across assorted texts (incl. empty, short
    // and duplicate-heavy docs) and shingle sizes.
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumped over the lazy dog",
      "a a a a a a a a", "a b a b a b a b",
      "", "one", "one two", "one two three",
      "Punctuation, CASE and   whitespace; should not matter!",
      "punctuation case and whitespace should not matter")
    val pairs = for (a <- texts; b <- texts) yield (a, b)
    for (k <- Seq(2, 3)) {
      val df = pairs.toDF("x", "y")
      val out = df.select(
        NativeExpressions.sortedJaccard(
          NativeExpressions.shingleHashes(col("x"), k),
          NativeExpressions.shingleHashes(col("y"), k)).as("hashed"),
        NativeExpressions.shingleJaccardNative(col("x"), col("y"), k).as("str"))
        .as[(Double, Double)].collect()
      out.zip(pairs).foreach { case ((h, s), (a, b)) =>
        assert(h === s, s"k=$k a='$a' b='$b'")
      }
    }
  }

  test("twoLevelAssign survives strict codegen and picks the nearest fine centroid") {
    // coarse cells 0 (x-axis) and 1 (y-axis); fine members: cell 0
    // holds {0: x-axis, 2: xy-diagonal}, cell 1 holds {1: y-axis}.
    // A vector near the diagonal probes cell 0 first (nprobe=1) and
    // must pick fine cell 2; a vector near y probes cell 1 -> cell 1.
    withCodegenStrict {
      import org.apache.spark.sql.functions._
      val df = Seq(
        (10L, Seq(0.9f, 0.8f)),
        (11L, Seq(0.1f, 1.0f))
      ).toDF("id", "v")
        .withColumn("coarse", array(
          struct(lit(0).as("ccell"), array(lit(1.0f), lit(0.0f)).as("cv")),
          struct(lit(1).as("ccell"), array(lit(0.0f), lit(1.0f)).as("cv"))))
        .withColumn("finemap", map_from_entries(array(
          struct(lit(0), array(
            struct(lit(0).as("cell"), array(lit(1.0f), lit(0.0f)).as("cv")),
            struct(lit(2).as("cell"), array(lit(0.7f), lit(0.7f)).as("cv")))),
          struct(lit(1), array(
            struct(lit(1).as("cell"), array(lit(0.0f), lit(1.0f)).as("cv")))))))
      val out = df.select(col("id"),
          NativeExpressions.twoLevelAssign(col("v"), col("coarse"),
            col("finemap"), 1).as("cell"))
        .as[(Long, Int)].collect().toMap
      assert(out === Map(10L -> 2, 11L -> 1))
    }
  }
}
