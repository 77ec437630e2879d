package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.Type.Repetition
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core.ChronoFs.PathOps

/** Driver-side parquet writer for the KB-scale metadata sidecars
  * (`_stats`, `_rollup`, `_manifest`, `_ann`).
  *
  * Motivation (r21, guide §5 "the driver should do almost no data
  * work" read in BOTH directions): the rows these files carry are
  * ALREADY driver-local — observe-folded sketch rows, directory
  * listings, centroid tables — yet every append/rewrite round-tripped
  * them through `spark.createDataFrame(...).coalesce(1).write.parquet`,
  * i.e. a scheduled Spark job plus the FileFormatWriter commit protocol
  * (staging dir, task commit, job commit, `_SUCCESS`) per KB file.
  * Measured at 0.1-0.3 s per append on an idle local[32] box, times
  * 2-3 appends per storage verb, times every verb in every lifecycle
  * gate — pure fixed overhead at ANY scale (a 100 TB deployment's
  * manifest append is the same KB write; Delta/Iceberg write their
  * commit metadata driver-side for exactly this reason). This writer
  * produces the file directly with parquet-hadoop, no job at all.
  *
  * Schema fidelity is the contract here (the r20 deferral reason):
  * files written by this path and by Spark must be INTERCHANGEABLE —
  * mixed fragment dirs are read with one explicit Spark schema and
  * folded losslessly, including the binary sketch columns (HLL/Bloom
  * byte images) and the dense CMS `array<bigint>` counters.
  * [[parquetType]] therefore mirrors Spark's ParquetWriteSupport
  * conversion exactly for the types the sidecar schemas use (primitive
  * leaves + the standard 3-level LIST shape, `spark_schema` root);
  * SidecarIoSpec pins the roundtrip per schema, nulls, empty arrays,
  * byte-exact binaries, and the mixed-dir fold.
  *
  * Visibility protocol for appends: the file is staged under a
  * dot-prefixed name in the SAME directory (hidden from Spark's file
  * listing and from the `.parquet`-suffix sidecar listings), then
  * renamed to its final `part-*.parquet` name — on local/HDFS an atomic
  * metadata move, so readers see either nothing or a complete file,
  * matching the visibility the Spark committer provided. A crashed
  * stage leaves only a hidden `.tmp` (never a half-visible fragment);
  * the next [[ChronoDB.recoverSidecar]]-guarded rewrite sweeps the dir.
  */
private[graft] object SidecarIO {

  /** Spark StructType → parquet MessageType, exactly as Spark's writer
    * converts it (root named `spark_schema`, standard LIST encoding).
    * Only the types the sidecar schemas use are mapped; anything else
    * fails loudly — extending the map requires extending the spec. */
  private[graft] def parquetType(schema: StructType): MessageType = {
    def prim(dt: DataType, rep: Repetition, name: String): Type = dt match {
      case StringType => Types.primitive(PrimitiveTypeName.BINARY, rep)
        .as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType => Types.primitive(PrimitiveTypeName.BINARY, rep).named(name)
      case LongType => Types.primitive(PrimitiveTypeName.INT64, rep).named(name)
      case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep).named(name)
      case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, rep).named(name)
      case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, rep).named(name)
      case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep).named(name)
      case other => throw new IllegalArgumentException(
        s"SidecarIO: unsupported sidecar column type $other ($name)")
    }
    val fields: Seq[Type] = schema.fields.toSeq.map { f =>
      val rep = if (f.nullable) Repetition.OPTIONAL else Repetition.REQUIRED
      f.dataType match {
        case ArrayType(et, containsNull) =>
          Types.buildGroup(rep).as(LogicalTypeAnnotation.listType())
            .addField(Types.repeatedGroup()
              .addField(prim(et,
                if (containsNull) Repetition.OPTIONAL else Repetition.REQUIRED,
                "element"))
              .named("list"))
            .named(f.name)
        case dt => prim(dt, rep, f.name)
      }
    }
    new MessageType("spark_schema", fields: _*)
  }

  private def codecOf(compression: String): CompressionCodecName =
    compression.toLowerCase match {
      case "zstd" => CompressionCodecName.ZSTD
      case "snappy" => CompressionCodecName.SNAPPY
      case "gzip" => CompressionCodecName.GZIP
      case "lz4" | "lz4_raw" | "lz4raw" => CompressionCodecName.LZ4_RAW
      case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
      case other => throw new IllegalArgumentException(
        s"SidecarIO: unknown compression '$other'")
    }

  private def addValue(g: Group, name: String, dt: DataType, v: Any): Unit =
    dt match {
      case StringType => g.add(name, Binary.fromString(v.asInstanceOf[String]))
      case BinaryType =>
        g.add(name, Binary.fromConstantByteArray(v.asInstanceOf[Array[Byte]]))
      case LongType => g.add(name, v.asInstanceOf[Long])
      case IntegerType => g.add(name, v.asInstanceOf[Int])
      case DoubleType => g.add(name, v.asInstanceOf[Double])
      case FloatType => g.add(name, v.asInstanceOf[Float])
      case BooleanType => g.add(name, v.asInstanceOf[Boolean])
      case other => throw new IllegalArgumentException(
        s"SidecarIO: unsupported value type $other ($name)")
    }

  private def writeFile(conf: Configuration, file: HPath,
      schema: StructType, rows: Seq[Row], compression: String): Unit = {
    val msg = parquetType(schema)
    val writer = ExampleParquetWriter.builder(file)
      .withConf(conf)
      .withType(msg)
      .withCompressionCodec(codecOf(compression))
      .build()
    try {
      val factory = new SimpleGroupFactory(msg)
      rows.foreach { row =>
        val g = factory.newGroup()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) f.dataType match {
            case ArrayType(et, _) =>
              // standard 3-level LIST: one `list` group per element —
              // an EMPTY array adds the outer group with no repetitions
              // (distinct from null, which never adds the group)
              val listG = g.addGroup(f.name)
              row.getSeq[Any](i).foreach { v =>
                val el = listG.addGroup("list")
                // a null element leaves the `list` group empty (the
                // OPTIONAL-element encoding); sidecar arrays are
                // containsNull=false so this is belt-and-braces
                if (v != null) addValue(el, "element", et, v)
              }
            case dt => addValue(g, f.name, dt, row.get(i))
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  /** APPEND one part file of `rows` to the sidecar dir, driver-side:
    * staged hidden (dot-prefixed, invisible to every reader), renamed
    * into place atomically. No Spark job. No-op on empty `rows` (the
    * Spark append path's behavior). */
  def appendRows(cfs: ChronoFs, conf: Configuration, dir: HPath,
      schema: StructType, rows: Seq[Row], compression: String): Unit = {
    if (rows.isEmpty) return
    val id = java.util.UUID.randomUUID().toString
    val tmp = dir.resolve(s".part-$id.parquet.tmp")
    val dst = dir.resolve(s"part-$id-drv.c000.parquet")
    writeFile(conf, tmp, schema, rows, compression)
    cfs.move(tmp, dst)
  }

  /** Stage a COMPLETE sidecar dir at `stageDir` (one part file +
    * `_SUCCESS`, the marker [[ChronoDB.recoverSidecar]]'s crash
    * protocol keys on), driver-side. The caller owns the swap. */
  def writeStagedDir(cfs: ChronoFs, conf: Configuration, stageDir: HPath,
      schema: StructType, rows: Seq[Row], compression: String): Unit = {
    val id = java.util.UUID.randomUUID().toString
    writeFile(conf, stageDir.resolve(s"part-$id-drv.c000.parquet"),
      schema, rows, compression)
    // empty _SUCCESS marker — program order guarantees the part file is
    // closed before it, same as Spark's job commit
    val out = cfs.fs.create(stageDir.resolve("_SUCCESS"), true)
    out.close()
  }
}
