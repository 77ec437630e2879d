package graft.core

import graft.SparkSuite
import java.nio.file.Files
import java.sql.Timestamp

class MaintenanceSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(k: String, t: String) = ChronoRow(k, ts(t), Array[Byte](1))

  test("tick compacts fragmented buckets and drops expired ones") {
    val db = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("maint").toString,
        ttl = Some(7200), compactFileThreshold = 2))
    db.createTable("a"); db.createTable("b")
    val now = ts("2024-01-01 12:30:00")
    // table a: fragmented current bucket (4 inserts, same hour)
    (1 to 4).foreach(i => db.insertSeq("a", Seq(row(s"k$i", s"2024-01-01 12:0$i:00")), now))
    // table b: one live bucket, one wholly expired bucket
    db.insertSeq("b", Seq(row("old", "2024-01-01 08:30:00")), ts("2024-01-01 09:00:00"))
    db.insertSeq("b", Seq(row("new", "2024-01-01 12:00:00")), now)

    val (compacted, dropped) = new Maintenance(db, () => db.listTables()).tick(now)
    assert(compacted === 1) // a's hour-12 bucket rewritten
    assert(dropped === 1)   // b's hour-08 bucket removed
    assert(db.table("a").count() === 4)
    assert(db.table("b").count() === 1)
  }
}
