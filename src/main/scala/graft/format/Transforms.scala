package graft.format

import graft.util.Murmur3
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.LocalDate

/** Partition transforms — hidden partitioning's scalar kernel
  * (reference api/.../transforms/: Bucket.java:83-272, Truncate.java:66-502,
  * Timestamps.java:34-38, Dates.java, Identity.java, VoidTransform.java).
  *
  * Canonical value model used across metadata and evaluators:
  * date = Int days since epoch, timestamp = Long micros since epoch (UTC),
  * everything else the obvious JVM type. Ordinals follow the Iceberg spec:
  * year/month/day/hour are *counts since 1970-01-01T00:00:00Z*, not calendar
  * fields — e.g. month("1971-02-xx") = 13.
  *
  * Each transform also provides:
  *  - `column(c, dt)`: the Spark Column computing it (write-path derivation);
  *  - `project`/`projectStrict`: predicate duals powering partition pruning
  *    (reference Bucket.java:113-151, ProjectionUtil.java). Inclusive
  *    projections are supersets (safe for pruning); strict projections are
  *    subsets (safe for proving whole-partition deletes).
  */
sealed trait Transform extends Serializable {
  def name: String
  /** Result type given the source type. */
  def resultType(src: DataType): DataType
  /** Apply to a canonical value (null-safe). */
  def apply(v: Any, src: DataType): Any
  /** Spark Column computing the transform of column `c` of type `dt`. */
  def column(c: Column, dt: DataType): Column
  /** Inclusive projection of a bound predicate on the source column into a
    * predicate on the transformed value; None = cannot project (no pruning). */
  def project(op: PredOp, values: Seq[Any], src: DataType): Option[(PredOp, Seq[Any])]
  /** Strict projection: transformed-pred implies source-pred for ALL rows. */
  def projectStrict(op: PredOp, values: Seq[Any], src: DataType): Option[(PredOp, Seq[Any])]
  /** Spec string, e.g. "bucket[16]" (reference Transforms.fromString:44-56). */
  override def toString: String = name
}

object Transforms {

  /** Canonicalize a Column to the hashable/ordinal domain: timestamps to
    * micros, dates to epoch days; other types pass through. */
  /** Micros-since-epoch of a TIMESTAMP_NTZ column, independent of the
    * session time zone (an NTZ value IS a local datetime; its canonical
    * micros interpret it at UTC — `unix_micros` rejects NTZ and a cast to
    * TIMESTAMP would shift by the session zone). */
  private val ntzMicros: Column => Column = {
    val f = udf((ldt: java.time.LocalDateTime) => if (ldt == null) null
      else Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L))
    c => f(c)
  }

  private def canon(c: Column, dt: DataType): Column = dt match {
    // unix_micros on TIMESTAMP is the stored micros — zone-independent
    case TimestampType => unix_micros(c)
    case TimestampNTZType => ntzMicros(c)
    case DateType => datediff(c, to_date(lit("1970-01-01")))
    case _ => c
  }

  private def micros(v: Any, dt: DataType): Long = dt match {
    case TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    case _ => throw new IllegalArgumentException(s"not a timestamp: $dt")
  }

  case object IdentityT extends Transform {
    val name = "identity"
    def resultType(src: DataType): DataType = src
    def apply(v: Any, src: DataType): Any = v
    def column(c: Column, dt: DataType): Column = c
    def project(op: PredOp, vs: Seq[Any], src: DataType) = Some((op, vs))
    def projectStrict(op: PredOp, vs: Seq[Any], src: DataType) = Some((op, vs))
  }

  case object VoidT extends Transform {
    val name = "void"
    def resultType(src: DataType): DataType = src
    def apply(v: Any, src: DataType): Any = null
    def column(c: Column, dt: DataType): Column = lit(null).cast(src(dt))
    private def src(dt: DataType) = dt
    def project(op: PredOp, vs: Seq[Any], src: DataType) = None
    def projectStrict(op: PredOp, vs: Seq[Any], src: DataType) = None
  }

  /** Murmur3-based bucketing (reference Bucket.java:43,83-88; hash layouts
    * :157-272 — golden vectors pinned in Murmur3Spec). */
  final case class BucketT(n: Int) extends Transform {
    val name = s"bucket[$n]"
    def resultType(src: DataType): DataType = IntegerType

    def hash(v: Any, src: DataType): Int = src match {
      case IntegerType => Murmur3.hashInt(v.asInstanceOf[Int])
      case LongType => Murmur3.hashLong(v.asInstanceOf[Long])
      case DateType => Murmur3.hashInt(v.asInstanceOf[Int])
      case TimestampType | TimestampNTZType => Murmur3.hashLong(v.asInstanceOf[Long])
      // canonical TIME is nanos-of-day; the iceberg spec buckets time by
      // its MICROS-of-day long, so hash at micros for spec parity
      case _: TimeType => Murmur3.hashLong(v.asInstanceOf[Long] / 1000L)
      case StringType => Murmur3.hashString(v.asInstanceOf[String])
      case FloatType => Murmur3.hashFloat(v.asInstanceOf[Float])
      case DoubleType => Murmur3.hashDouble(v.asInstanceOf[Double])
      case _: DecimalType => Murmur3.hashDecimal(v.asInstanceOf[java.math.BigDecimal])
      case BinaryType => Murmur3.hashBytes(v.asInstanceOf[Array[Byte]])
      case t => throw new IllegalArgumentException(s"cannot bucket $t")
    }

    def apply(v: Any, src: DataType): Any =
      if (v == null) null else (hash(v, src) & Integer.MAX_VALUE) % n

    def column(c: Column, dt: DataType): Column = dt match {
      case StringType =>
        udf((s: String) => if (s == null) null
          else Int.box((Murmur3.hashString(s) & Integer.MAX_VALUE) % n))
          .apply(c)
      case _: TimeType => // micros-of-day, matching hash() above
        udf((t: java.time.LocalTime) => if (t == null) null
          else Int.box((Murmur3.hashLong(t.toNanoOfDay / 1000L) &
            Integer.MAX_VALUE) % n))
          .apply(c)
      case d: DecimalType =>
        // the spec hashes the UNSCALED value at the column's declared
        // scale. The udf is fed through a STRING cast because Spark casts
        // udf BigDecimal inputs to the system default (38,18): lossy for
        // scale > 18 (rounds) and precision-scale > 20 (overflows to
        // null) — either silently places rows in a different bucket than
        // the pruning evaluators project predicates into, the same
        // row-loss class as the earlier catch-all LONG cast (regression:
        // TableFormatSpec "bucket partitioning on DECIMAL"). Decimal →
        // string → BigDecimal is exact at ANY (precision, scale): Spark
        // renders the full value (scientific notation parses losslessly)
        val scale = d.scale
        udf((s: String) => if (s == null) null
          else Int.box((Murmur3.hashDecimal(new java.math.BigDecimal(s)
            .setScale(scale, java.math.RoundingMode.UNNECESSARY)) &
            Integer.MAX_VALUE) % n))
          .apply(c.cast(StringType))
      case BinaryType =>
        udf((b: Array[Byte]) => if (b == null) null
          else Int.box((Murmur3.hashBytes(b) & Integer.MAX_VALUE) % n))
          .apply(c)
      case FloatType | DoubleType => // hashFloat widens, matching hash()
        udf((v: java.lang.Double) => if (v == null) null
          else Int.box((Murmur3.hashDouble(v) & Integer.MAX_VALUE) % n))
          .apply(c.cast(DoubleType))
      case IntegerType | LongType | DateType | TimestampType
          | TimestampNTZType => // canonicalize to a long (hashInt == hashLong)
        udf((l: java.lang.Long) => if (l == null) null
          else Int.box((Murmur3.hashLong(l) & Integer.MAX_VALUE) % n))
          .apply(canon(c, dt).cast(LongType))
      case t => throw new IllegalArgumentException(
        s"cannot bucket $t in write path")
    }

    // Inclusive: only point predicates can cross a hash (Bucket.java:113-130)
    def project(op: PredOp, vs: Seq[Any], src: DataType) = op match {
      case PredOp.Eq => Some((PredOp.Eq, vs.map(apply(_, src))))
      case PredOp.In => Some((PredOp.In, vs.map(apply(_, src)).distinct))
      case _ => None
    }
    // Strict: hash differs ⇒ value differs (Bucket.java:134-151)
    def projectStrict(op: PredOp, vs: Seq[Any], src: DataType) = op match {
      case PredOp.NotEq => Some((PredOp.NotEq, vs.map(apply(_, src))))
      case PredOp.NotIn => Some((PredOp.NotIn, vs.map(apply(_, src)).distinct))
      case _ => None
    }
  }

  /** Width-truncation (reference Truncate.java: ints :84, longs :168,
    * strings-by-codepoint :231, decimal :413, binary :323). */
  final case class TruncateT(w: Int) extends Transform {
    val name = s"truncate[$w]"
    def resultType(src: DataType): DataType = src

    def apply(v: Any, src: DataType): Any =
      if (v == null) null
      else src match {
        case IntegerType => val i = v.asInstanceOf[Int]; i - (((i % w) + w) % w)
        case LongType => val l = v.asInstanceOf[Long]; l - (((l % w) + w) % w)
        case StringType =>
          val s = v.asInstanceOf[String]
          val cps = s.codePointCount(0, s.length)
          if (cps <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
        case d: DecimalType =>
          val bd = v.asInstanceOf[java.math.BigDecimal]
          val unscaled = bd.unscaledValue()
          val width = java.math.BigInteger.valueOf(w.toLong)
          val mod = unscaled.mod(width) // BigInteger.mod is non-negative
          new java.math.BigDecimal(unscaled.subtract(mod), bd.scale())
        case BinaryType =>
          val b = v.asInstanceOf[Array[Byte]]
          if (b.length <= w) b else java.util.Arrays.copyOf(b, w)
        case t => throw new IllegalArgumentException(s"cannot truncate $t")
      }

    def column(c: Column, dt: DataType): Column = dt match {
      case IntegerType | LongType => c - pmod(c, lit(w).cast(dt))
      case StringType =>
        udf((s: String) => if (s == null) null
          else apply(s, StringType).asInstanceOf[String]).apply(c)
      case d: DecimalType =>
        // same unscaled-modulus kernel as `apply`; string-fed AND
        // string-returned because Spark coerces udf BigDecimal inputs and
        // outputs to (38,18) — lossy for scale > 18 / precision-scale > 20
        // (see BucketT). The final cast back to the declared type is exact:
        // truncation preserves the scale and never grows the magnitude
        val scale = d.scale
        udf((s: String) => if (s == null) null
          else apply(new java.math.BigDecimal(s)
            .setScale(scale, java.math.RoundingMode.UNNECESSARY), d)
            .asInstanceOf[java.math.BigDecimal].toPlainString)
          .apply(c.cast(StringType)).cast(d)
      case BinaryType =>
        udf((b: Array[Byte]) => if (b == null) null
          else apply(b, BinaryType).asInstanceOf[Array[Byte]]).apply(c)
      case t => throw new IllegalArgumentException(s"cannot truncate $t in write path")
    }

    // t is monotone non-decreasing ⇒ order predicates survive inclusively
    def project(op: PredOp, vs: Seq[Any], src: DataType) = op match {
      case PredOp.Eq => Some((PredOp.Eq, vs.map(apply(_, src))))
      case PredOp.In => Some((PredOp.In, vs.map(apply(_, src)).distinct))
      case PredOp.Lt | PredOp.LtEq => Some((PredOp.LtEq, vs.map(apply(_, src))))
      case PredOp.Gt | PredOp.GtEq => Some((PredOp.GtEq, vs.map(apply(_, src))))
      case PredOp.StartsWith if src == StringType =>
        val p = vs.head.asInstanceOf[String]
        if (p.codePointCount(0, p.length) <= w) Some((PredOp.StartsWith, Seq(p)))
        else Some((PredOp.Eq, Seq(apply(p, src))))
      case PredOp.NotStartsWith if src == StringType =>
        // prefix within the truncation width: a value starts with p iff
        // its partition value does, so the projection is EXACT (uniform
        // within each partition) — usable inclusively and strictly
        val p = vs.head.asInstanceOf[String]
        if (p.codePointCount(0, p.length) <= w)
          Some((PredOp.NotStartsWith, Seq(p)))
        else None
      case _ => None
    }
    def projectStrict(op: PredOp, vs: Seq[Any], src: DataType) = op match {
      case PredOp.Lt => Some((PredOp.Lt, vs.map(apply(_, src))))
      case PredOp.Gt => Some((PredOp.Gt, vs.map(apply(_, src))))
      case PredOp.NotEq => None // same truncation can hold unequal values
      case PredOp.StartsWith if src == StringType =>
        // prefix within the width: partitions are prefix-uniform, so the
        // projection is exact strictly too — this is what makes
        // `DELETE WHERE s LIKE 'p%'` a metadata-only whole-partition drop
        val p = vs.head.asInstanceOf[String]
        if (p.codePointCount(0, p.length) <= w)
          Some((PredOp.StartsWith, Seq(p)))
        else None // pv == trunc(p) can't prove the tail chars
      case PredOp.NotStartsWith if src == StringType =>
        val p = vs.head.asInstanceOf[String]
        if (p.codePointCount(0, p.length) <= w)
          Some((PredOp.NotStartsWith, Seq(p))) // exact (see project)
        else
          // prefix longer than the width: partitions whose value differs
          // from truncate(p) hold ONLY non-p-prefixed (non-null) rows
          Some((PredOp.NotEq, Seq(apply(p, src))))
      case _ => None
    }
  }

  /** Time ordinals (reference Timestamps.java:34-38, Dates.java). */
  sealed abstract class TimeT(val name: String) extends Transform {
    def resultType(src: DataType): DataType = IntegerType
    protected def ofMicros(us: Long): Int
    protected def ofDays(d: Int): Int

    def apply(v: Any, src: DataType): Any =
      if (v == null) null
      else src match {
        case DateType => ofDays(v.asInstanceOf[Int])
        case TimestampType | TimestampNTZType => ofMicros(micros(v, src))
        case t => throw new IllegalArgumentException(s"cannot $name $t")
      }

    /** Write-path derivation, all codegen'd builtins and all ZONE-FREE.
      * The previous TIMESTAMP expressions (`year(c)`, `datediff(c, ...)`,
      * `cast(TimestampType)`) extracted fields in the SESSION time zone,
      * so any writer session not pinned to UTC derived a different
      * ordinal than the pruning evaluators project (`apply` is UTC-micros
      * by construction): rows landed in partitions the planner then
      * pruned away for point/range predicates near midnight offsets.
      * Now: DATE extracts calendar fields directly (no zone exists);
      * TIMESTAMP goes through `unix_micros` + exact floor division (the
      * same kernel as `apply`, integer-exact for negatives via pmod);
      * TIMESTAMP_NTZ extracts its local fields directly (an NTZ value IS
      * a local datetime — extraction is zone-free by type). Pinned by
      * TableFormatSpec's non-UTC agreement test. */
    final def column(c: Column, dt: DataType): Column = dt match {
      case DateType => dateColumn(c)
      case TimestampType => tsColumn(unix_micros(c))
      case TimestampNTZType => ntzColumn(c)
      case t => throw new IllegalArgumentException(
        s"cannot $name $t in write path")
    }
    protected def dateColumn(c: Column): Column
    /** Ordinal from zone-free micros-since-epoch (TIMESTAMP source). */
    protected def tsColumn(us: Column): Column
    /** Ordinal from local calendar fields (TIMESTAMP_NTZ source). */
    protected def ntzColumn(c: Column): Column

    // monotone ⇒ same inclusive/strict rules as truncate
    def project(op: PredOp, vs: Seq[Any], src: DataType) = op match {
      case PredOp.Eq => Some((PredOp.Eq, vs.map(apply(_, src))))
      case PredOp.In => Some((PredOp.In, vs.map(apply(_, src)).distinct))
      case PredOp.Lt | PredOp.LtEq => Some((PredOp.LtEq, vs.map(apply(_, src))))
      case PredOp.Gt | PredOp.GtEq => Some((PredOp.GtEq, vs.map(apply(_, src))))
      case _ => None
    }
    def projectStrict(op: PredOp, vs: Seq[Any], src: DataType) = op match {
      case PredOp.Lt => Some((PredOp.Lt, vs.map(apply(_, src))))
      case PredOp.Gt => Some((PredOp.Gt, vs.map(apply(_, src))))
      case PredOp.NotEq => None
      case _ => None
    }
  }

  private def epochDaysOf(us: Long): Int = Math.floorDiv(us, 86400000000L).toInt

  /** Exact FLOOR division of a micros column (codegen'd; `/` alone
    * truncates toward zero and misplaces every pre-epoch value): subtract
    * the non-negative pmod remainder first, so the quotient is an exact
    * multiple (double-safe far beyond the timestamp range). */
  private def floorDivCol(us: Column, unit: Long): Column =
    ((us - pmod(us, lit(unit))) / lit(unit)).cast(IntegerType)

  /** Zone-free UTC calendar date of a micros column. */
  private def utcDateCol(us: Column): Column =
    date_add(to_date(lit("1970-01-01")), floorDivCol(us, 86400000000L))

  case object YearT extends TimeT("year") {
    protected def ofMicros(us: Long): Int = ofDays(epochDaysOf(us))
    protected def ofDays(d: Int): Int = LocalDate.ofEpochDay(d.toLong).getYear - 1970
    protected def dateColumn(c: Column): Column =
      (year(c) - lit(1970)).cast(IntegerType)
    protected def tsColumn(us: Column): Column = dateColumn(utcDateCol(us))
    protected def ntzColumn(c: Column): Column = dateColumn(c)
  }

  case object MonthT extends TimeT("month") {
    protected def ofMicros(us: Long): Int = ofDays(epochDaysOf(us))
    protected def ofDays(d: Int): Int = {
      val ld = LocalDate.ofEpochDay(d.toLong)
      (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
    }
    protected def dateColumn(c: Column): Column =
      ((year(c) - lit(1970)) * lit(12) + month(c) - lit(1)).cast(IntegerType)
    protected def tsColumn(us: Column): Column = dateColumn(utcDateCol(us))
    protected def ntzColumn(c: Column): Column = dateColumn(c)
  }

  case object DayT extends TimeT("day") {
    protected def ofMicros(us: Long): Int = epochDaysOf(us)
    protected def ofDays(d: Int): Int = d
    protected def dateColumn(c: Column): Column =
      datediff(c, to_date(lit("1970-01-01"))).cast(IntegerType)
    protected def tsColumn(us: Column): Column = floorDivCol(us, 86400000000L)
    // NTZ→DATE drops the local time — calendar-only, zone-free
    protected def ntzColumn(c: Column): Column = dateColumn(c.cast(DateType))
  }

  case object HourT extends TimeT("hour") {
    protected def ofMicros(us: Long): Int = Math.floorDiv(us, 3600000000L).toInt
    protected def ofDays(d: Int): Int =
      throw new IllegalArgumentException("cannot hour-transform a date")
    protected def dateColumn(c: Column): Column =
      throw new IllegalArgumentException("cannot hour-transform a date")
    protected def tsColumn(us: Column): Column = floorDivCol(us, 3600000000L)
    // days*24 + local hour ≡ floorDiv(localMicros, hour) — exact for
    // pre-epoch too (days is already floored)
    protected def ntzColumn(c: Column): Column =
      (datediff(c.cast(DateType), to_date(lit("1970-01-01"))) * lit(24) +
        hour(c)).cast(IntegerType)
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Parse from spec string (reference Transforms.fromString:44-56). */
  def fromString(s: String): Transform = s match {
    case "identity" => IdentityT
    case "void" => VoidT
    case "year" => YearT
    case "month" => MonthT
    case "day" => DayT
    case "hour" => HourT
    case BucketRe(n) => BucketT(n.toInt)
    case TruncateRe(w) => TruncateT(w.toInt)
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }
}
