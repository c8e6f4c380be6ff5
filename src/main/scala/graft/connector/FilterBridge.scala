package graft.connector

import graft.format.{Expr, Exprs}
import org.apache.spark.sql.sources._

/** Spark `sources.Filter` → graft `Expr` (the reference's SparkFilters
  * bridge, spark3/.../SparkFilters.java:64-201). Unconvertible filters
  * return None and simply stay Spark-side — residual safety: Spark
  * re-applies every filter after the scan regardless. */
object FilterBridge {

  def convert(f: Filter): Option[Expr] = f match {
    case EqualTo(a, v) => Some(Exprs.equal(a, v))
    case EqualNullSafe(a, null) => Some(Exprs.isNull(a))
    case EqualNullSafe(a, v) => Some(Exprs.equal(a, v))
    case GreaterThan(a, v) => Some(Exprs.gt(a, v))
    case GreaterThanOrEqual(a, v) => Some(Exprs.gtEq(a, v))
    case LessThan(a, v) => Some(Exprs.lt(a, v))
    case LessThanOrEqual(a, v) => Some(Exprs.ltEq(a, v))
    case In(a, vs) =>
      // the reference drops null IN-values (SparkFilters.java:148-154)
      Some(Exprs.in(a, vs.filter(_ != null).toSeq))
    case IsNull(a) => Some(Exprs.isNull(a))
    case IsNotNull(a) => Some(Exprs.notNull(a))
    case And(l, r) =>
      for { cl <- convert(l); cr <- convert(r) } yield Exprs.and(cl, cr)
    case Or(l, r) =>
      for { cl <- convert(l); cr <- convert(r) } yield Exprs.or(cl, cr)
    case Not(c) => convert(c).map(Exprs.not)
    case StringStartsWith(a, p) => Some(Exprs.startsWith(a, p))
    case _ => None
  }

  /** Convert the convertible subset; the rest is Spark's problem. */
  def convertAll(filters: Array[Filter]): Expr =
    filters.flatMap(convert).foldLeft(Exprs.alwaysTrue)(Exprs.and)
}
