package graft.connector

import graft.format.OrcIO
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Row-path ORC scan for groups TARGETED by position deletes: Spark's
  * vectorized ORC reader does not populate the synthetic row-index column
  * the parquet path rides, so these groups stream rows through OrcIO with
  * an incrementing file-position counter appended as the last column —
  * position deletes are format-agnostic in the reference
  * (PositionStreamDeleteFilter, core/.../deletes/Deletes.java:70-123).
  *
  * One InputPartition per FILE, unsplit: a split would need stripe-level
  * row offsets to keep positions absolute. File-level parallelism is
  * preserved, untargeted ORC groups stay on Spark's vectorized OrcScan,
  * and compaction (delete-aware rewrite) clears this state — a
  * position-deleted ORC file is transitional by design. */
final case class OrcRowFilePartition(path: String,
    consts: Seq[Any]) extends InputPartition

final class GraftOrcRowScan(
    dataSchema: StructType, // file-side names, target types (data columns)
    files: Seq[(String, Seq[Any])], // path + partition-served constants
    conf: org.apache.spark.util.SerializableConfiguration,
    // partition-served identity columns (imported hive layouts): the
    // column exists only in the partition tuple, so the reader serves it
    // as a per-file CONSTANT — in the same slot Spark's own readers give
    // it via the file index, between any stored-lineage tail and `_file`.
    // Omitting them (the pre-fix shape) left the physical row NARROWER
    // than the declared output whenever `_pos`/lineage forced this scan
    // on a table with metadata-only partition columns.
    partConsts: StructType = new StructType(),
    appendFilePath: Boolean = false, // serve `_file` after the constants
    // trailing STORED-lineage columns in dataSchema (compacted v3 files):
    // the counter must sit BETWEEN the data columns and these, because the
    // group layout downstream is [data..., rowIdx, stored..., consts...,
    // _file?] — the same slot the parquet path's synthetic row-index
    // column occupies
    trailingStored: Int = 0,
    // groups routed here only for the mixed-sign-zero hazard (no live
    // position deletes, no computed lineage) need no position counter —
    // their declared layout has no rowIdx slot
    withRowIndex: Boolean = true)
  extends Scan with Batch with Serializable {

  private def dataLen = dataSchema.length - trailingStored

  override def readSchema(): StructType =
    StructType(dataSchema.fields.take(dataLen).toSeq ++
      (if (withRowIndex) Seq(StructField("_graft_row_index", LongType))
       else Nil) ++
      dataSchema.fields.drop(dataLen) ++
      partConsts.fields ++
      (if (appendFilePath)
        Seq(StructField(GraftSparkTable.FileColumn, StringType, nullable = false))
      else Nil))
  override def toBatch: Batch = this
  override def description(): String = s"graft-orc-rows(${files.size} files)"

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (p, cs) => OrcRowFilePartition(p, cs): InputPartition }
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new OrcRowReaderFactory(dataSchema, conf, partConsts.length,
      appendFilePath, trailingStored, withRowIndex)
}

final class OrcRowReaderFactory(dataSchema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    numConsts: Int = 0,
    appendFilePath: Boolean = false,
    trailingStored: Int = 0,
    withRowIndex: Boolean = true)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[OrcRowFilePartition]
    val path = part.path
    new PartitionReader[InternalRow] {
      private val it = OrcIO.open(path, dataSchema, conf.value)
      private var current: InternalRow = _
      private var rowIndex = -1L
      private val dataLen = dataSchema.length - trailingStored
      private val idxSlot = if (withRowIndex) 1 else 0
      private val width =
        dataSchema.length + idxSlot + numConsts +
          (if (appendFilePath) 1 else 0)
      private val pathUtf8 =
        org.apache.spark.unsafe.types.UTF8String.fromString(path)

      override def next(): Boolean = {
        val row = it.read()
        if (row == null) false
        else {
          rowIndex += 1
          // the deserializer reuses its row — copy values out, inserting
          // the absolute file position between the data columns and any
          // stored-lineage tail, then the partition-served constants,
          // then `_file` when requested, last
          val out = new GenericInternalRow(width)
          var i = 0
          while (i < dataLen) {
            out.update(i, if (row.isNullAt(i)) null
              else row.get(i, dataSchema(i).dataType))
            i += 1
          }
          if (withRowIndex) out.update(dataLen, rowIndex)
          var j = 0
          while (j < trailingStored) {
            val src = dataLen + j
            out.update(src + idxSlot, if (row.isNullAt(src)) null
              else row.get(src, dataSchema(src).dataType))
            j += 1
          }
          var k = 0
          while (k < numConsts) {
            out.update(dataSchema.length + idxSlot + k, part.consts(k))
            k += 1
          }
          if (appendFilePath)
            out.update(dataSchema.length + idxSlot + numConsts, pathUtf8)
          current = out
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = it.close()
    }
  }
}
