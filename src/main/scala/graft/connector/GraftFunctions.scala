package graft.connector

import graft.format.Transforms
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** SQL-callable transform functions (SURVEY §7.3: FunctionCatalog exposing
  * `system.bucket` etc. — the reference's Spark 3.3+ lineage does the same
  * so queries can filter/join on partition values explicitly). Semantics
  * delegate to the SAME Transform kernel the write path uses, so
  * `g.system.bucket(16, id)` always agrees with partition placement.
  */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "years", "months", "days", "hours")

  // width must be positive: truncate_0 would divide by zero / emit empty
  // prefixes at eval time — reject it at resolution instead (the same
  // guard Transforms.TruncateT applies on the write path)
  private val TruncW = "truncate_([1-9]\\d*)".r

  def load(name: String): UnboundFunction = name match {
    case "bucket" => new TransformUnbound("bucket", twoArg = true,
      (w, dt) => Transforms.BucketT(w), IntegerType)
    case "truncate" => new TruncateUnbound
    // width-baked single-argument spelling, reported by the scan's
    // KeyGroupedPartitioning: Spark's key-grouping only supports
    // single-child transform expressions (bucket's numBuckets literal is
    // special-cased into numBucketsOpt; a generic literal argument
    // disqualifies the partitioning), so truncate[W] rides as its own
    // function name with the width inside the binding — and inside
    // canonicalName, so different widths never compare compatible
    case TruncW(w) => new TruncateFixedUnbound(w.toInt)
    case "years" => new TimeUnbound("years", Transforms.YearT)
    case "months" => new TimeUnbound("months", Transforms.MonthT)
    case "days" => new TimeUnbound("days", Transforms.DayT)
    case "hours" => new TimeUnbound("hours", Transforms.HourT)
    case other => throw new NoSuchElementException(s"function $other")
  }

  private def canonical(row: InternalRow, i: Int, dt: DataType): Any = {
    if (row.isNullAt(i)) return null
    dt match {
      case IntegerType | DateType => row.getInt(i)
      // TIME rides internally as nanos-of-day longs (the canonical form)
      case LongType | TimestampType | TimestampNTZType | _: TimeType =>
        row.getLong(i)
      case StringType => row.getUTF8String(i).toString
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
      case BinaryType => row.getBinary(i)
      case t => throw new IllegalArgumentException(s"unsupported input $t")
    }
  }

  /** bucket(width, col) — width is the leading int argument. */
  final class TransformUnbound(fname: String, twoArg: Boolean,
      mk: (Int, DataType) => graft.format.Transform, result: DataType)
    extends UnboundFunction {
    override def name(): String = fname
    override def description(): String = s"graft partition transform $fname"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, s"$fname(width, col)")
      val dt = inputType.fields(1).dataType
      new BoundTransform(fname, dt, result, (row: InternalRow) => {
        val w = row.getInt(0)
        mk(w, dt).apply(canonical(row, 1, dt), dt)
      }, Array(IntegerType, dt))
    }
  }

  final class TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String = "graft truncate[w] transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "truncate(width, col)")
      val dt = inputType.fields(1).dataType
      new BoundTransform("truncate", dt, dt, (row: InternalRow) => {
        val w = row.getInt(0)
        Transforms.TruncateT(w).apply(canonical(row, 1, dt), dt)
      }, Array(IntegerType, dt))
    }
  }

  final class TruncateFixedUnbound(w: Int) extends UnboundFunction {
    override def name(): String = s"truncate_$w"
    override def description(): String = s"graft truncate[$w] transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"truncate_$w(col)")
      val dt = inputType.fields.head.dataType
      new BoundTransform(s"truncate_$w", dt, dt, (row: InternalRow) =>
        Transforms.TruncateT(w).apply(canonical(row, 0, dt), dt), Array(dt))
    }
  }

  final class TimeUnbound(fname: String, t: graft.format.Transform)
    extends UnboundFunction {
    override def name(): String = fname
    override def description(): String = s"graft $fname ordinal transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$fname(col)")
      val dt = inputType.fields.head.dataType
      new BoundTransform(fname, dt, IntegerType,
        (row: InternalRow) => t.apply(canonical(row, 0, dt), dt), Array(dt))
    }
  }

  /** Interpreted ScalarFunction over canonical values; results are
    * primitives (Int or the source type), converted back to internal form. */
  final class BoundTransform(fname: String, src: DataType, result: DataType,
      f: InternalRow => Any, inputs: Array[DataType])
    extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = inputs
    override def resultType(): DataType = result
    override def name(): String = fname
    // Spark's default canonicalName() is a RANDOM UUID per binding, so two
    // scans of equally-bucketed tables would never compare as the same
    // function and storage-partitioned joins would silently shuffle. A
    // stable name keyed by function + input types is the documented
    // contract ("same for semantically equal functions").
    override def canonicalName(): String =
      s"graft.$fname(${inputs.map(_.catalogString).mkString(",")})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any = f(input) match {
      case null => null
      case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case bd: java.math.BigDecimal =>
        org.apache.spark.sql.types.Decimal(bd)
      case other => other
    }
  }
}
