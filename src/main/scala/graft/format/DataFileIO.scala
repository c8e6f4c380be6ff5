package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Format-dispatching executor-side row I/O over data files — ONE seam for
  * every code path that streams data files row-wise (compaction rewrite,
  * delete-key loading stays parquet-only since delete files are always
  * parquet, the DSv2 fanout writers). Mirrors the reference's FileFormat
  * dispatch in GenericReader/FileAppenderFactory (api/.../FileFormat.java).
  */
object DataFileIO {

  /** Stream `path` (of `format`) projected to `schema` (file-side names). */
  def readAll(path: String, format: String, schema: StructType,
      conf: Configuration)(consume: InternalRow => Unit): Unit = format match {
    case FileFormats.Orc => OrcIO.readAll(path, schema, conf)(consume)
    case FileFormats.Avro => AvroIO.readAll(path, schema, conf)(consume)
    case _ => ParquetIO.readAll(path, schema, conf)(consume)
  }

  /** One open data file of any supported encoding + its end-of-file metrics
    * (footer read for parquet/ORC; writer-side count for Avro, which has no
    * footer stats — reference FileAppender.metrics()). */
  trait Writer {
    def write(row: InternalRow): Unit
    /** Close and return the file's metrics keyed by `idSchema` field ids. */
    def finish(): Metrics.FileMetrics
    def abort(): Unit
  }

  /** Table property naming the codec for each format (reference
    * TableProperties.PARQUET_COMPRESSION / AVRO_COMPRESSION + the ORC
    * analog); default snappy everywhere. */
  def compressionKey(format: String): String = s"write.$format.compression-codec"

  /** Resolve AND canonicalize the codec choice — one validation point for
    * every write path, so a property value accepted by the DSv2 writers is
    * never rejected (or mapped differently) by Spark's own writer on the
    * library path. Canonical names are what BOTH paths understand. */
  def compressionOf(format: String, props: Map[String, String]): String = {
    val raw = props.getOrElse(compressionKey(format), "snappy").toLowerCase
    val canonical = (format, raw) match {
      case (_, "snappy") => "snappy"
      case (FileFormats.Parquet, "none" | "uncompressed") => "uncompressed"
      case (FileFormats.Parquet, "gzip" | "zstd") => raw
      case (FileFormats.Orc, "none" | "uncompressed") => "none"
      case (FileFormats.Orc, "zlib" | "gzip") => "zlib"
      case (FileFormats.Orc, "zstd" | "lz4") => raw
      case (FileFormats.Avro, "none" | "uncompressed" | "null") => "none"
      case (FileFormats.Avro, "deflate" | "gzip") => "deflate"
      case (FileFormats.Avro, "zstd") => "zstd"
      case _ => throw new IllegalArgumentException(
        s"unsupported ${compressionKey(format)}: $raw")
    }
    canonical
  }

  /** Open a writer for `format`. `schema` is the clean (id-less) write
    * schema; `idSchema` carries field ids for metrics keying. For parquet,
    * `conf` must carry the ParquetWriteSupport session keys (use
    * ParquetIO.writeConf or a batch-write factory conf). `props` supplies
    * the per-format `write.<fmt>.compression-codec` choice. */
  def openWriter(path: String, format: String, schema: StructType,
      idSchema: StructType, conf: Configuration,
      statModes: Map[Int, Metrics.Mode] = Map.empty,
      props: Map[String, String] = Map.empty): Writer = {
    val codec = compressionOf(format, props)

    def delete(): Unit = {
      val hp = new org.apache.hadoop.fs.Path(path)
      try hp.getFileSystem(conf).delete(hp, false) catch { case _: Throwable => }
    }

    format match {
      case FileFormats.Orc => new Writer {
        private val w = OrcIO.openWriter(path, schema, conf, codec)
        override def write(row: InternalRow): Unit = w.write(row)
        override def finish(): Metrics.FileMetrics = {
          w.close()
          OrcIO.footerMetrics(path, idSchema, conf, statModes)
        }
        override def abort(): Unit = {
          try w.close() catch { case _: Throwable => }
          delete()
        }
      }
      case FileFormats.Avro => new Writer {
        private val w = AvroIO.openWriter(path, schema, conf, codec = codec)
        override def write(row: InternalRow): Unit = w.write(row)
        override def finish(): Metrics.FileMetrics = {
          val n = w.count
          w.close()
          val hp = new org.apache.hadoop.fs.Path(path)
          val size = hp.getFileSystem(conf).getFileStatus(hp).getLen
          // Avro carries no column statistics — record count + size only
          Metrics.FileMetrics(n, size, Map.empty, Map.empty, Map.empty,
            Map.empty, Nil)
        }
        override def abort(): Unit = {
          try w.close() catch { case _: Throwable => }
          delete()
        }
      }
      case _ => new Writer {
        private val w = ParquetIO.openWriter(path, schema, conf, codec)
        override def write(row: InternalRow): Unit = w.write(row)
        override def finish(): Metrics.FileMetrics = {
          w.close()
          Metrics.fromParquetFooter(path, idSchema, conf, statModes)
        }
        override def abort(): Unit = {
          try w.close() catch { case _: Throwable => }
          delete()
        }
      }
    }
  }
}
