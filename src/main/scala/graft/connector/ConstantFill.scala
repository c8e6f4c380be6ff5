package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Per-group constant backfill for initial column defaults (iceberg v3):
  * a scan group whose writer schema predates a defaulted column reads that
  * column from Spark's file sources as all-null (requested-but-absent);
  * these wrappers substitute the default. They compose UNDER the delete
  * filters, so equality-delete keys on a defaulted column see the filled
  * value.
  *
  * `fills`: (physical ordinal in the group's read row, clean data type,
  * CATALYST default value). `nested`: struct-NESTED defaulted fields this
  * generation predates — (top ordinal, field-index path inside the struct,
  * value); applied on the ROW path only (a constant inside a non-constant
  * struct has no columnar shortcut), so groups with nested fills drop the
  * scan to rows. */
final case class FillConfig(types: Seq[DataType],
    fills: Seq[(Int, DataType, Any)],
    nested: Seq[(Int, Seq[Int], Any)] = Nil) extends Serializable

/** Columnar: replace the null vectors with constant vectors — zero per-row
  * work, and the batch stays columnar (no repack). */
final class ConstantFillColumnarReader(
    inner: PartitionReader[ColumnarBatch], cfg: FillConfig)
  extends PartitionReader[ColumnarBatch] {

  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    if (!inner.next()) return false
    val b = inner.get()
    val n = b.numRows()
    val cols = Array.tabulate[ColumnVector](b.numCols())(b.column)
    cfg.fills.foreach { case (ord, dt, v) =>
      cols(ord) = ConstantFill.vector(n, dt, v)
    }
    current = new ColumnarBatch(cols, n)
    true
  }
  override def get(): ColumnarBatch = current
  override def close(): Unit = inner.close()
}

/** Row path (ORC/Avro row scans): copy each row with the fills applied —
  * these paths already pay a per-row conversion, so one more copy is in
  * kind. */
final class ConstantFillRowReader(
    inner: PartitionReader[InternalRow], cfg: FillConfig)
  extends PartitionReader[InternalRow] {

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!inner.next()) return false
    val row = inner.get()
    val out = new GenericInternalRow(cfg.types.length)
    var i = 0
    while (i < cfg.types.length) {
      out.update(i, if (row.isNullAt(i)) null else row.get(i, cfg.types(i)))
      i += 1
    }
    cfg.fills.foreach { case (ord, _, v) => out.update(ord, v) }
    cfg.nested.foreach { case (ord, path, v) =>
      val st = cfg.types(ord).asInstanceOf[StructType]
      if (!row.isNullAt(ord))
        out.update(ord,
          graft.format.Defaults.fillStruct(row.getStruct(ord, st.length), st, path, v))
    }
    current = out
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

object ConstantFill {
  /** A constant vector of `n` rows (defaults are restricted to atomic
    * types at ADD COLUMN time, so this matrix is exhaustive). */
  def vector(n: Int, dt: DataType, v: Any): ConstantColumnVector = {
    val c = new ConstantColumnVector(n, dt)
    if (v == null) { c.setNull(); return c }
    dt match {
      case BooleanType => c.setBoolean(v.asInstanceOf[Boolean])
      case ByteType => c.setByte(v.asInstanceOf[Byte])
      case ShortType => c.setShort(v.asInstanceOf[Short])
      case IntegerType | DateType => c.setInt(v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType | _: TimeType =>
        c.setLong(v.asInstanceOf[Long])
      case FloatType => c.setFloat(v.asInstanceOf[Float])
      case DoubleType => c.setDouble(v.asInstanceOf[Double])
      case StringType =>
        c.setUtf8String(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      case BinaryType => c.setBinary(v.asInstanceOf[Array[Byte]])
      case d: DecimalType =>
        c.setDecimal(v.asInstanceOf[org.apache.spark.sql.types.Decimal],
          d.precision)
      case other => throw new IllegalStateException(
        s"unsupported default type: $other")
    }
    c
  }
}
