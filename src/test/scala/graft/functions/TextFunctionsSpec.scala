package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit
      enc: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("t").select(c.as("out")).as[T](enc).head()

  test("tokens and counts") {
    val df = Seq("The quick brown fox, the fox!").toDF("t")
    assert(df.select(TextFunctions.tokenCount(col("t"))).as[Int].head() === 6)
    assert(df.select(TextFunctions.punctCount(col("t"))).as[Int].head() === 2)
    assert(df.select(TextFunctions.stopwordCount(col("t"))).as[Int].head() === 2)
  }

  test("mean token length") {
    val df = Seq("ab abcd").toDF("t")
    assert(df.select(TextFunctions.meanTokenLen(col("t"))).as[Double].head() === 3.0)
  }

  test("shingles produce k-grams in order") {
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(TextFunctions.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("fingerprint is whitespace-insensitive but order-sensitive") {
    val fp = (s: String) =>
      Seq(s).toDF("t").select(TextFunctions.fingerprint(col("t"))).as[Long].head()
    assert(fp("hello  world") === fp("hello world"))
    assert(fp("hello world") !== fp("world hello"))
    // pinned value of the portable polynomial formulation
    // (h*131 + codepoint) mod 2^31-1 over "hello world" — must agree
    // with the DuckDB oracle's list_reduce replication
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 131L + c.toLong) % 2147483647L)
    assert(fp("Hello,  World! 42") === ref("hello world 42"))
    assert(fp("") === 0L)
    assert(fp("   --- !!!") === 0L)
  }

  test("langId picks marker-heavy language") {
    val en = "the cat and the dog went to the park with that man"
    val de = "der hund und die katze sind nicht mit der maus"
    val fr = "le chat et la souris sont pour les enfants une surprise"
    val df = Seq(en, de, fr).toDF("t")
      .select(TextFunctions.langId(col("t"))).as[String].collect()
    assert(df.toSeq === Seq("en", "de", "fr"))
  }

  test("quality score in [0,1], penalizes junk") {
    val good = "the quick brown fox jumps over the lazy dog near the river bank today"
    val junk = "!!! ??? ,,, ;;; ... ((( ))) [[[ ]]] {{{ }}}"
    val out = Seq(good, junk).toDF("t")
      .select(TextFunctions.qualityScore(col("t"))).as[Double].collect()
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(0) > out(1))
  }

  test("approx BPE token count scales with length") {
    val df = Seq("short text", "a considerably longer and more elaborate sentence with many words").toDF("t")
    val out = df.select(TextFunctions.approxBpeTokenCount(col("t"))).as[Long].collect()
    assert(out(1) > out(0))
  }

  test("redactPii masks emails, IPv4s, and long digit runs") {
    val cases = Seq(
      "mail a.b+c@ex-ample.co.uk now" -> "mail [EMAIL] now",
      "host 192.168.0.1 port 80" -> "host [IP] port 80",
      "card 4111111111111111 ref 123456789" -> "card [NUM] ref [NUM]",
      "version 1.2 build 3, untouched" -> "version 1.2 build 3, untouched")
    val out = cases.map(_._1).toDF("t")
      .select(col("t"), TextFunctions.redactPii(col("t")),
        TextFunctions.emailCount(col("t")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    out.zip(cases).foreach { case ((in, got, nEmail), (_, want)) =>
      assert(got === want, s"input '$in'")
      assert(nEmail === (if (in.contains("@")) 1 else 0))
    }
  }
}
