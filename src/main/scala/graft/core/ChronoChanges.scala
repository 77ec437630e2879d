package graft.core

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Predicate, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
    diff(counted(added, "__a"), counted(removed, "__r"), cols)
      .select((cols.map(col) :+ col("_change_type")): _*)
  }

  /** The MULTI-COMMIT form the streaming feed plans its whole batch
    * with: ONE frame over every commit in the range, `_commit_version`
    * carried as a PARTITION column of the file index (each data file is
    * assigned the version of the commit that added/removed it), so the
    * plan has exactly two scan legs — adds and removes — however many
    * commits the batch spans. The per-commit union this replaces built
    * one plan leg PER commit: a catch-up batch over a 10k-commit
    * backlog paid analyzer/optimizer cost superlinear in plan size on
    * the driver before a row moved.
    *
    * Semantics are identical to mapping [[frame]] over the commits and
    * unioning: the bag diff groups on (cols, version), so adds and
    * removes net out only WITHIN a commit (a compact's rewrite cancels;
    * a row deleted in v5 that was inserted in v3 still shows both). */
  def versionedFrame(spark: SparkSession, tableRoot: HPath,
      schema: StructType, cols: Seq[String],
      commits: Seq[ChronoCommit]): DataFrame = {
    val keys = cols :+ "_commit_version"
    def counted(side: ChronoCommit => Seq[ManifestEntry], as: String)
        : DataFrame = {
      val entries = commits.flatMap(c => side(c).map(e => (e, c.version)))
      val index = new VersionedManifestFileIndex(tableRoot, entries)
      val rel = HadoopFsRelation(
        location = index,
        partitionSchema = index.partitionSchema,
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat(),
        options = Map.empty[String, String])(spark)
      spark.baseRelationToDataFrame(rel)
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as(as))
    }
    diff(counted(_.adds, "__a"), counted(_.removes, "__r"), keys)
      .select((cols.map(col) :+ col("_change_type") :+
        col("_commit_version")): _*)
  }

  /** Net the per-row counts of the two sides (full-outer, null-safe on
    * every key) and explode the surplus into change rows. Output:
    * `keys` plus `_change_type`. */
  private def diff(a: DataFrame, r: DataFrame,
      keys: Seq[String]): DataFrame = {
    val net = a.join(r,
        keys.map(c => a(c) <=> r(c)).reduce(_ && _), "full_outer")
      .select((keys.map(c => coalesce(a(c), r(c)).as(c)) :+
        (coalesce(a("__a"), lit(0L)) - coalesce(r("__r"), lit(0L)))
          .as("__net")): _*)
      .filter(col("__net") =!= 0L)
    net.select((keys.map(col) :+
        when(col("__net") > 0, lit("insert")).otherwise(lit("delete"))
          .as("_change_type") :+
        abs(col("__net")).as("__n")): _*)
      .withColumn("__i", explode(expr("sequence(1, __n)")))
      .drop("__n", "__i")
  }
}

/** [[ManifestFileIndex]]'s change-feed twin: the same manifest-driven
  * scan planning, with a second partition column `_commit_version`
  * labeling each file with the history commit it belongs to — how one
  * scan node serves a whole multi-commit feed batch without a
  * per-commit plan leg. Partition pruning evaluates filters over BOTH
  * columns against the in-memory groups, same contract as the
  * single-column index. */
private[graft] final class VersionedManifestFileIndex(
    tableRoot: HPath,
    entries: Seq[(ManifestEntry, Long)]) extends FileIndex {

  private val byGroup: Seq[((String, Long), Seq[ManifestEntry])] =
    entries.groupBy { case (e, v) => (e.bucket, v) }
      .map { case (k, es) => (k, es.map(_._1)) }.toSeq.sortBy(_._1)

  override val rootPaths: Seq[HPath] = Seq(tableRoot)

  override val partitionSchema: StructType = StructType(Seq(
    StructField("bucket", StringType, nullable = true),
    StructField("_commit_version", LongType, nullable = false)))

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val surviving: ((String, Long)) => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val predicate = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              BoundReference(if (a.name == "bucket") 0 else 1,
                a.dataType, nullable = true)
          })
        predicate.initialize(0)
        g => predicate.eval(
          InternalRow(UTF8String.fromString(g._1), g._2))
      }
    byGroup.filter(g => surviving(g._1)).map { case ((b, v), fs) =>
      PartitionDirectory(
        InternalRow(UTF8String.fromString(b), v),
        fs.map(statusOf).toArray)
    }
  }

  private def pathOf(e: ManifestEntry): HPath =
    new HPath(new HPath(tableRoot, s"bucket=${e.bucket}"), e.file)

  private def statusOf(e: ManifestEntry): FileStatus =
    new FileStatus(e.size, false, 1, 128L * 1024 * 1024, e.mtime, pathOf(e))

  override def inputFiles: Array[String] =
    entries.map(e => pathOf(e._1).toString).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = entries.map(_._1.size).sum
}
