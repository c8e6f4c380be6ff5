package graft.connector

import graft.format.AvroIO
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.StructType

/** DSv2 scan over a group of Avro data files (reference
  * core/.../avro/Avro.java read path + ProjectionDatumReader): Spark ships
  * no Avro datasource in this build, so the group scan is a thin custom
  * Batch — one InputPartition per container file, readers stream
  * GenericRecords through AvroIO's resolving projection into InternalRows.
  *
  * Scale shape: Avro files are written at the table's target file size, so
  * file-granular partitions ≈ maxPartitionBytes-granular splits; the format
  * carries no column stats, so there is no row-group pushdown to lose —
  * file-level pruning already happened in planFiles, and Spark re-applies
  * every filter above this scan (residual safety). `partValues` appends
  * identity-partition constants for columns served from partition tuples
  * (imported-layout tables whose current format is Avro), mirroring what
  * Spark's own FileScan does with readPartitionSchema.
  */
final case class AvroFilePartition(path: String, partValues: Seq[Any])
  extends InputPartition

final class GraftAvroScan(
    readSchema: StructType, // file-side names, target types (data columns)
    partSchema: StructType, // partition-served columns, appended after data
    files: Seq[(String, Seq[Any])], // (path, partition-served values)
    conf: org.apache.spark.util.SerializableConfiguration)
  extends Scan with Batch with Serializable {

  override def readSchema(): StructType = StructType(readSchema ++ partSchema)
  override def toBatch: Batch = this
  override def description(): String = s"graft-avro(${files.size} files)"

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (p, vals) => AvroFilePartition(p, vals): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(readSchema, partSchema.length, conf)
}

final class AvroReaderFactory(readSchema: StructType, partCols: Int,
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[AvroFilePartition]
    new PartitionReader[InternalRow] {
      private val it = AvroIO.open(ap.path, readSchema, conf.value)
      private var current: InternalRow = _
      private val width = readSchema.length + partCols

      override def next(): Boolean = {
        val row = it.read()
        if (row == null) false
        else {
          current =
            if (partCols == 0) row
            else {
              // append partition-served constants after the data columns —
              // the same output layout Spark's FileScan produces
              val out = new GenericInternalRow(width)
              var i = 0
              while (i < readSchema.length) {
                out.update(i, if (row.isNullAt(i)) null
                  else row.get(i, readSchema(i).dataType))
                i += 1
              }
              ap.partValues.zipWithIndex.foreach { case (v, j) =>
                out.update(readSchema.length + j, v)
              }
              out
            }
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = it.close()
    }
  }
}
