package graft.format

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key: each column maps to an order-preserving
  * unsigned 8-byte encoding, and the per-column bytes interleave round-robin
  * into one binary sort key. Sorting by that key clusters rows so that a
  * range predicate on ANY of the participating columns maps to a bounded
  * band of the key space — after a z-clustered rewrite, min/max file stats
  * prune on every dimension, not just the leading sort column.
  *
  * Textbook space-filling-curve clustering (Morton 1966); no counterpart in
  * the reference fork, which has no sort surface at all. Interleaving is
  * BIT-granular: with 8-byte big-endian encodings, low-cardinality values
  * differ only in their trailing bytes, so byte-granular interleaving would
  * degenerate into a plain lexicographic sort on the first column — bit
  * interleaving keeps every dimension's bits adjacent at each significance
  * level, which is what makes all dimensions band.
  *
  * Order-preserving encodings (all comparisons become unsigned
  * lexicographic):
  *  - signed integers / date / timestamp: value XOR sign-bit, big-endian
  *  - float / double: IEEE bits, negatives bit-flipped (total order)
  *  - string: first 8 UTF-8 bytes, zero-padded
  *  - null: all-zero (sorts first within its dimension's band)
  */
object ZOrder {

  private val Width = 8

  private def putLong(out: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { out(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
  }

  /** v with the sign bit flipped: signed order → unsigned byte order. */
  private def signFlip(v: Long): Long = v ^ Long.MinValue

  /** IEEE-754 total-order trick: non-negative floats get the sign bit set,
    * negative floats get ALL bits flipped, making byte order = numeric
    * order (with -0.0 < +0.0 and NaN sorting last — fine for clustering). */
  private def floatBits(bits: Long): Long =
    if (bits < 0) ~bits else bits ^ Long.MinValue

  private[format] def encode(value: Any): Array[Byte] = {
    val out = new Array[Byte](Width)
    value match {
      case null => ()
      case b: Boolean => out(7) = if (b) 1 else 0
      case b: Byte => putLong(out, 0, signFlip(b.toLong))
      case s: Short => putLong(out, 0, signFlip(s.toLong))
      case i: Int => putLong(out, 0, signFlip(i.toLong))
      case l: Long => putLong(out, 0, signFlip(l))
      case f: Float =>
        putLong(out, 0, floatBits(java.lang.Float.floatToIntBits(f).toLong << 32))
      case d: Double =>
        putLong(out, 0, floatBits(java.lang.Double.doubleToLongBits(d)))
      case s: String =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        System.arraycopy(b, 0, out, 0, math.min(b.length, Width))
      case d: java.sql.Date => putLong(out, 0, signFlip(d.getTime))
      case t: java.sql.Timestamp => putLong(out, 0, signFlip(t.getTime))
      case d: java.math.BigDecimal =>
        putLong(out, 0, floatBits(
          java.lang.Double.doubleToLongBits(d.doubleValue())))
      case other => throw new IllegalArgumentException(
        s"z-order: unsupported value type ${other.getClass.getName}")
    }
    out
  }

  /** Round-robin BIT interleave of equal-width encodings: output bit
    * `b * dims + d` is bit `b` (MSB-first) of dimension `d`. */
  private[format] def interleave(encs: Array[Array[Byte]]): Array[Byte] = {
    val n = encs.length
    val out = new Array[Byte](n * Width)
    var b = 0
    while (b < Width * 8) {
      var d = 0
      while (d < n) {
        if (((encs(d)(b >>> 3) >>> (7 - (b & 7))) & 1) != 0) {
          val ob = b * n + d
          out(ob >>> 3) = (out(ob >>> 3) | (1 << (7 - (ob & 7)))).toByte
        }
        d += 1
      }
      b += 1
    }
    out
  }

  // per-type encoder UDFs (boxed inputs so NULL reaches `encode` as null);
  // `array()` requires one common element type, so every dimension encodes
  // to BinaryType first and the interleave runs over an array<binary>
  private val encLong = udf((v: java.lang.Long) => encode(v))
  private val encDouble = udf((v: java.lang.Double) => encode(v))
  private val encString = udf((v: String) => encode(v))
  private val encTs = udf((v: java.sql.Timestamp) => encode(v))
  private val encDate = udf((v: java.sql.Date) => encode(v))
  private val zInterleave =
    udf((arr: Seq[Array[Byte]]) => interleave(arr.toArray))

  /** The z-value as a Column over `cols` of `df` (BinaryType; Spark orders
    * binary unsigned-lexicographically, matching the encodings). */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    val encoded = cols.map { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c"))
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          encLong(col(c).cast(LongType))
        case FloatType | DoubleType | _: DecimalType =>
          encDouble(col(c).cast(DoubleType))
        case StringType => encString(col(c))
        case TimestampType => encTs(col(c))
        case TimestampNTZType => encTs(col(c).cast(TimestampType))
        case DateType => encDate(col(c))
        case BooleanType => encLong(when(col(c), 1L).otherwise(0L))
        case dt => throw new IllegalArgumentException(
          s"z-order: unsupported column type ${dt.simpleString} for $c")
      }
    }
    zInterleave(array(encoded: _*))
  }
}
