package graft.core

import org.apache.spark.sql.SparkSession

/** Second-JVM contender for [[CrossProcessLockSpec]] — a REAL process
  * boundary on the writer LOCK. The in-JVM LeaseLockSpec fakes a
  * crashed holder by aging the lock file's mtime; this main lets the
  * spec race an ACTUAL separate process (open vs open, crash without
  * release) against the suite's own handle, driving the REAL
  * [[ChronoDB]] open path — heartbeat thread, takeover CAS and all.
  *
  * Stdout protocol (one token per line, parsed by the spec):
  * `ACQUIRED`, `RELEASED`, `REFUSED <reason>`.
  *
  * Modes:
  *  - `open <dir> <leaseMs>` — try to acquire once, release, exit.
  *  - `hold <dir> <leaseMs> <holdMs>` — acquire, hold (the handle's own
  *    daemon heartbeats), release, exit.
  *  - `crash <dir> <leaseMs>` — acquire, then `Runtime.halt`: no
  *    close(), no shutdown hooks — the LOCK file survives exactly as a
  *    kill -9 would leave it.
  */
object LockContenderMain {

  /** Launch the contender as a SECOND JVM with this test JVM's own
    * classpath and the JDK17 add-opens Spark needs (mirrors build.sbt)
    * — the one copy both CrossProcessLockSpec and SharedWritersSpec
    * use, so a JDK/Spark flag bump happens in one place. */
  def launch(args: String*): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    new ProcessBuilder((Seq(java) ++ opens ++ Seq("-Xmx1500m",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.core.LockContenderMain") ++ args): _*)
      .redirectErrorStream(true).start()
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val leaseMs = args(2).toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = ChronoConfig(dir, bucket = "day", sketchLgK = 0,
      sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 1,
      lockLeaseMs = leaseMs)
    def say(s: String): Unit = { println(s); Console.out.flush() }
    mode match {
      case "open" =>
        try {
          val db = new ChronoDB(spark, cfg)
          say("ACQUIRED")
          db.close()
          say("RELEASED")
        } catch {
          case e: DatabaseLockedException => say(s"REFUSED ${e.getMessage}")
        }
        spark.stop()
      case "hold" =>
        val db = new ChronoDB(spark, cfg)
        say("ACQUIRED")
        Thread.sleep(args(3).toLong)
        db.close()
        say("RELEASED")
        spark.stop()
      case "crash" =>
        new ChronoDB(spark, cfg)
        say("ACQUIRED")
        Runtime.getRuntime.halt(0)
      case "shared" =>
        // SHARED-WRITER contender: verb-scoped locking, k single-row
        // inserts into table 't' with a caller-chosen key prefix —
        // raced by the spec against its own writer and a sibling
        // process
        val db = new ChronoDB(spark, cfg.copy(
          lockMode = "verb", lockWaitMs = 120000L))
        val prefix = args(3)
        val k = args(4).toInt
        (1 to k).foreach { i =>
          db.insertSeq("t", Seq(ChronoRow(s"$prefix$i",
            java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
            Array((i % 127).toByte))))
        }
        db.close()
        say("DONE")
        spark.stop()
      case other =>
        say(s"REFUSED unknown mode $other")
        sys.exit(2)
    }
  }
}
