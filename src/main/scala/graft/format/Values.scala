package graft.format

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._
import java.util.Base64

/** JSON codec for canonical values, typed by the table schema (our analog of
  * the reference's single-value serialization used in metadata;
  * bounds there are binary `Conversions.toByteBuffer` — we use typed JSON,
  * same information). */
object Values {

  def toJson(parent: ObjectNode, field: String, v: Any, dt: DataType): Unit = {
    if (v == null) { parent.putNull(field); return }
    dt match {
      case IntegerType | DateType => parent.put(field, v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        parent.put(field, v.asInstanceOf[Long])
      case DoubleType => parent.put(field, v.asInstanceOf[Double])
      case FloatType => parent.put(field, v.asInstanceOf[Float])
      case StringType => parent.put(field, v.asInstanceOf[String])
      case BooleanType => parent.put(field, v.asInstanceOf[Boolean])
      case _: DecimalType =>
        parent.put(field, v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case BinaryType =>
        parent.put(field, Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
      case t => throw new IllegalArgumentException(s"cannot serialize $t")
    }
  }

  def fromJson(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) return null
    dt match {
      case IntegerType | DateType => n.asInt()
      case LongType | TimestampType | TimestampNTZType => n.asLong()
      case DoubleType => n.asDouble()
      case FloatType => n.asDouble().toFloat
      case StringType => n.asText()
      case BooleanType => n.asBoolean()
      case _: DecimalType => new java.math.BigDecimal(n.asText())
      case BinaryType => Base64.getDecoder.decode(n.asText())
      case t => throw new IllegalArgumentException(s"cannot deserialize $t")
    }
  }

  /** Render a partition value as the hive-style dir string Spark writes. */
  def toDirString(v: Any): String = v match {
    case null => "__HIVE_DEFAULT_PARTITION__"
    case other => other.toString
  }

  /** Parse a hive-style partition dir string back to a canonical value. */
  def fromDirString(s: String, dt: DataType): Any = {
    if (s == "__HIVE_DEFAULT_PARTITION__") return null
    dt match {
      case IntegerType | DateType => s.toInt
      case LongType | TimestampType | TimestampNTZType => s.toLong
      case StringType => s
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s.toBoolean
      case _: DecimalType => new java.math.BigDecimal(s)
      case t => throw new IllegalArgumentException(s"cannot parse partition $t")
    }
  }

  /** Parse an EXTERNAL hive dir value (as Spark/Hive render them — dates as
    * `2024-01-01`, not our canonical day ordinals) to a canonical value.
    * Used by partitioned table import (SparkTableUtil.java:569-631). */
  def fromHiveDirString(s: String, dt: DataType): Any = {
    if (s == "__HIVE_DEFAULT_PARTITION__") return null
    dt match {
      case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case TimestampType | TimestampNTZType => throw new IllegalArgumentException(
        "timestamp-partitioned imports are not supported; re-partition by date")
      case other => fromDirString(s, other)
    }
  }

  /** Canonical value → Catalyst internal value (partition values served
    * through the DSv2 FileIndex ride InternalRows). */
  def toCatalyst(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(v.asInstanceOf[String])
      case d: DecimalType =>
        Decimal(v.asInstanceOf[java.math.BigDecimal])
      case _ => v // Int/Long/Double/Float/Boolean; date days; ts micros
    }

  /** Canonical value → typed Column literal (library-path partition fill). */
  def toLiteral(v: Any, dt: DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    if (v == null) return lit(null).cast(dt)
    dt match {
      case DateType =>
        lit(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        lit(java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L))
      case TimestampNTZType =>
        val us = v.asInstanceOf[Long]
        lit(java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
      case other => lit(v).cast(other)
    }
  }
}
