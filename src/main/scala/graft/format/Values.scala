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
}
