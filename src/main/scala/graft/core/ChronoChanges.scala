package graft.core

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The row-level CHANGE-FEED frame shared by the batch verb
  * ([[ChronoDB.changesBetween]]) and the streaming change-feed source
  * ([[graft.sources.ChronoChangeFeedSource]]): the bag diff between two
  * file sets of one table, as the declared columns plus `_change_type`
  * ('insert' | 'delete'; an update surfaces as the delete+insert pair).
  *
  * Scale shape: both sides plan ONLY the given files through the pinned
  * manifest index; the diff is one shuffle sized by the changed data.
  * Bag-correct under duplicate rows (per-row counts, net decides), and
  * NULL-SAFE on every column (additive evolution reads NULL in later
  * columns for pre-ALTER files — a null-unsafe join would split such an
  * unchanged row into a phantom delete+insert pair). */
object ChronoChanges {

  def frame(spark: SparkSession, tableRoot: HPath, schema: StructType,
      cols: Seq[String], added: Seq[ManifestEntry],
      removed: Seq[ManifestEntry]): DataFrame = {
    def counted(entries: Seq[ManifestEntry], as: String): DataFrame =
      ManifestFileIndex.relation(spark, tableRoot, schema, entries)
        .groupBy(cols.map(col): _*).agg(count(lit(1)).as(as))
    val a = counted(added, "__a")
    val r = counted(removed, "__r")
    val net = a.join(r,
        cols.map(c => a(c) <=> r(c)).reduce(_ && _), "full_outer")
      .select((cols.map(c => coalesce(a(c), r(c)).as(c)) :+
        (coalesce(a("__a"), lit(0L)) - coalesce(r("__r"), lit(0L)))
          .as("__net")): _*)
      .filter(col("__net") =!= 0L)
    net.select((cols.map(col) :+
        when(col("__net") > 0, lit("insert")).otherwise(lit("delete"))
          .as("_change_type") :+
        abs(col("__net")).as("__n")): _*)
      .withColumn("__i", explode(expr("sequence(1, __n)")))
      .drop("__n", "__i")
  }
}
