package graft

/** Every declared query must build and execute on sf0.001; oracle-backed
  * queries must be non-degenerate (rows > 0) so the driver's hash compare
  * actually compares something. */
class QueriesSmokeSpec extends SparkSuite {

  SparkEntry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001") {
      val n = q.build(spark, sf()).count()
      if (q.oracle.isDefined)
        assert(n > 0, s"${q.name} returned 0 rows — degenerate oracle check")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all oracle keys correspond to declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every declared query carries a full oracle — the correctness contract") {
    // a query without an oracle gets only the driver's weak rows>0
    // check; the engine's standing claim is that EVERY declared query
    // is hash-verified, so an oracle-less declaration is a regression
    val missing = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: ${missing.mkString(", ")}")
  }

  test("every query id claimed in main-source scaladoc exists in the registry") {
    // the r13 lesson: Dedup's scaladoc claimed "d35b declares the hashed
    // DEFAULT" while no d35b was registered — dead code with false docs
    // shipped a round. This guard extracts short query ids (d35b, q19,
    // s3b…) from COMMENT lines of every main source file and requires a
    // registered query with that prefix.
    import scala.jdk.CollectionConverters._
    val prefixes = SparkEntry.all.map(_.name.takeWhile(_ != '_')).toSet
    val idPat = "\\b([dqs][0-9]{1,2}[a-z]?)\\b".r
    val src = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq
    val unknown = src.flatMap { f =>
      java.nio.file.Files.readAllLines(f).asScala.zipWithIndex
        .filter { case (l, _) =>
          val t = l.trim
          t.startsWith("*") || t.startsWith("//") || t.startsWith("/**")
        }
        .flatMap { case (l, i) =>
          idPat.findAllMatchIn(l)
            // a key-path literal like "d05/" is not a query claim, and
            // neither is a filesystem scheme like "s3a://"
            .filter(m => m.end >= l.length ||
              (l.charAt(m.end) != '/' && l.charAt(m.end) != ':'))
            .map(_.group(1)).toSeq.distinct
            // an id satisfied by any registered prefix it opens (q09
            // names the q09b/c/d family), or by its zero-padded core
            // form (q1 ≡ q01)
            .filterNot(id => prefixes.exists(_.startsWith(id)))
            .filterNot(id => prefixes.contains(
              id.head + "0" + id.tail))
            .map(id => s"$id (${f.getFileName}:${i + 1})")
        }
    }
    assert(unknown.isEmpty,
      s"scaladoc claims query ids with no registry entry:\n" +
        unknown.mkString("\n"))
  }
}
