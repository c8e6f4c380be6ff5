package graft.connector

import graft.format.{Expr, Exprs}
import org.apache.spark.sql.sources._

/** Spark `sources.Filter` → graft `Expr` (the reference's SparkFilters
  * bridge, spark3/.../SparkFilters.java:64-201). Unconvertible filters
  * return None and simply stay Spark-side — residual safety: Spark
  * re-applies every filter after the scan regardless.
  *
  * Conversion is polarity-aware: dropping null IN-values (the reference
  * does the same, SparkFilters.java:148-154) selects exactly the same
  * ROWS as the SQL predicate — TRUE rows — but flips that predicate's
  * NULLs to FALSE, so under an odd number of NOTs the converted
  * expression selects rows SQL would not (`a NOT IN (1, NULL)` is never
  * TRUE in SQL, yet `NotIn(a, [1])` matches every a ≠ 1). A null-carrying
  * IN in negative position is therefore UNconvertible — the delete path
  * then routes to the row-level operation, which evaluates the original
  * Catalyst predicate with proper three-valued logic. */
object FilterBridge {

  def convert(f: Filter): Option[Expr] = conv(f, positive = true)

  private def conv(f: Filter, positive: Boolean): Option[Expr] = f match {
    // a bare `DELETE FROM t` arrives as the literal TRUE filter — without
    // this case canDeleteWhere refused and Spark errored out ("Cannot
    // delete from table where [TRUE]") instead of truncating
    case _: AlwaysTrue => Some(Exprs.alwaysTrue)
    case _: AlwaysFalse => Some(Exprs.alwaysFalse)
    // null-valued comparisons stay unconverted (Catalyst normally folds
    // them away first; if one does arrive, binding a null literal throws
    // and an unpushed filter is never wrong)
    case EqualTo(_, null) | GreaterThan(_, null) | GreaterThanOrEqual(_, null)
       | LessThan(_, null) | LessThanOrEqual(_, null) => None
    case EqualTo(a, v) => Some(Exprs.equal(a, v))
    case EqualNullSafe(a, null) => Some(Exprs.isNull(a))
    case EqualNullSafe(a, v) =>
      // positive: `a <=> v` (v non-null) selects exactly `a = v`'s TRUE
      // rows. Negative: `NOT (a <=> v)` is TRUE on null rows, but Eq's
      // negation (NotEq) is never TRUE on null — unconvertible (the
      // property spec's second find; same class as the NOT IN rule)
      if (positive) Some(Exprs.equal(a, v)) else None
    case GreaterThan(a, v) => Some(Exprs.gt(a, v))
    case GreaterThanOrEqual(a, v) => Some(Exprs.gtEq(a, v))
    case LessThan(a, v) => Some(Exprs.lt(a, v))
    case LessThanOrEqual(a, v) => Some(Exprs.ltEq(a, v))
    case In(a, vs) =>
      if (!positive && vs.contains(null)) None // see scaladoc
      else Some(Exprs.in(a, vs.filter(_ != null).toSeq))
    case IsNull(a) => Some(Exprs.isNull(a))
    case IsNotNull(a) => Some(Exprs.notNull(a))
    case And(l, r) =>
      for { cl <- conv(l, positive); cr <- conv(r, positive) } yield Exprs.and(cl, cr)
    case Or(l, r) =>
      for { cl <- conv(l, positive); cr <- conv(r, positive) } yield Exprs.or(cl, cr)
    case Not(c) => conv(c, !positive).map(Exprs.not)
    // convertible in BOTH polarities: notStartsWith is non-null-and-not-
    // prefixed, exactly `NOT (s LIKE 'p%')`'s TRUE rows, so the NOT
    // rewrite stays total and bridge output stays Not-free
    case StringStartsWith(a, p) => Some(Exprs.startsWith(a, p))
    case _ => None
  }

  /** Convert the convertible subset; the rest is Spark's problem. Safe
    * ONLY where something re-applies the full original predicate (the
    * scan residual) or a caller has verified every filter converts
    * (canDeleteWhere) — a dropped filter WIDENS the expression. */
  def convertAll(filters: Array[Filter]): Expr =
    filters.flatMap(convert).foldLeft(Exprs.alwaysTrue)(Exprs.and)

  /** STRICT v2 Predicate → v1 Filter. Spark's own bridge
    * (`PredicateUtils.toV1`, used by the default
    * `SupportsDelete.canDeleteWhere(Predicate[])`) is LOSSY on OR: when
    * one disjunct doesn't convert it returns the other disjunct alone
    * (verified against the installed spark-catalyst 4.1.2 bytecode),
    * silently NARROWING the predicate — a metadata DELETE then removes a
    * subset of the condition's rows while Spark believes the whole DELETE
    * executed (rows matching only the dropped disjunct survive; found by
    * the round-20 workload fuzzer as `DELETE WHERE id % 2 = 0 OR d > x`
    * deleting nothing). This converter is all-or-nothing on every node:
    * anything inexact returns None, the caller answers canDeleteWhere
    * false, and Spark keeps the row-level ReplaceData plan, which
    * evaluates the original Catalyst condition. */
  def toV1Strict(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[Filter] = {
    import org.apache.spark.sql.connector.expressions.{Literal => XLit, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => XPred, And => XAnd, Or => XOr, Not => XNot, AlwaysTrue => XTrue, AlwaysFalse => XFalse}
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    def ref(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference => Some(r.fieldNames().mkString("."))
        case _ => None
      }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression): Option[Any] =
      e match {
        case l: XLit[_] =>
          Some(CatalystTypeConverters.convertToScala(l.value(), l.dataType()))
        case _ => None
      }
    def binary(mk: (String, Any) => Filter,
        flip: (String, Any) => Filter): Option[Filter] = {
      val c = p.children()
      if (c.length != 2) None
      else (ref(c(0)), lit(c(1)), ref(c(1)), lit(c(0))) match {
        case (Some(a), Some(v), _, _) => Some(mk(a, v))
        case (_, _, Some(a), Some(v)) => Some(flip(a, v))
        case _ => None
      }
    }
    p match {
      case _: XTrue => Some(AlwaysTrue)
      case _: XFalse => Some(AlwaysFalse)
      case a: XAnd =>
        for (l <- toV1Strict(a.left()); r <- toV1Strict(a.right())) yield And(l, r)
      case o: XOr =>
        for (l <- toV1Strict(o.left()); r <- toV1Strict(o.right())) yield Or(l, r)
      case n: XNot => toV1Strict(n.child()).map(Not)
      case _ => p.name() match {
        case "=" => binary(EqualTo(_, _), EqualTo(_, _))
        case "<=>" => binary(EqualNullSafe(_, _), EqualNullSafe(_, _))
        case "<" => binary(LessThan(_, _), GreaterThan(_, _))
        case "<=" => binary(LessThanOrEqual(_, _), GreaterThanOrEqual(_, _))
        case ">" => binary(GreaterThan(_, _), LessThan(_, _))
        case ">=" => binary(GreaterThanOrEqual(_, _), LessThanOrEqual(_, _))
        case "IS_NULL" if p.children().length == 1 =>
          ref(p.children()(0)).map(IsNull)
        case "IS_NOT_NULL" if p.children().length == 1 =>
          ref(p.children()(0)).map(IsNotNull)
        case "IN" if p.children().nonEmpty =>
          val vals = p.children().drop(1).map(lit)
          for (a <- ref(p.children()(0));
               vs <- if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None)
            yield In(a, vs)
        case "STARTS_WITH" =>
          val c = p.children()
          if (c.length != 2) None
          else for (a <- ref(c(0)); v <- lit(c(1)).collect { case s: String => s })
            yield StringStartsWith(a, v)
        case _ => None
      }
    }
  }

  /** Convert for positions with NO residual re-apply (filter overwrite):
    * every filter must convert, or the operation is refused loudly —
    * silently dropping one would widen the overwrite's delete scope up
    * to a full-table truncate. */
  def convertRequired(filters: Array[Filter]): Expr = {
    val bad = filters.filter(f => convert(f).isEmpty)
    if (bad.nonEmpty) throw new UnsupportedOperationException(
      "cannot convert filter(s) for overwrite: " + bad.mkString(", ") +
      " — rewrite the condition with supported predicates " +
      "(=, <=>, <, <=, >, >=, IN, IS NULL, AND, OR, NOT, startsWith)")
    convertAll(filters)
  }
}
