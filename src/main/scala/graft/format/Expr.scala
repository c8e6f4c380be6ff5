package graft.format

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Predicate operations (reference api/.../expressions/Expression.java:28-74:
  * the Operation enum + negate()). */
sealed trait PredOp { def negate: PredOp }
object PredOp {
  case object IsNull extends PredOp { def negate = NotNull }
  case object NotNull extends PredOp { def negate = IsNull }
  case object Lt extends PredOp { def negate = GtEq }
  case object LtEq extends PredOp { def negate = Gt }
  case object Gt extends PredOp { def negate = LtEq }
  case object GtEq extends PredOp { def negate = Lt }
  case object Eq extends PredOp { def negate = NotEq }
  case object NotEq extends PredOp { def negate = Eq }
  case object In extends PredOp { def negate = NotIn }
  case object NotIn extends PredOp { def negate = In }
  case object StartsWith extends PredOp { def negate = NotStartsWith }
  /** TRUE iff the value is NON-NULL and does not start with the prefix —
    * exactly SQL's `NOT (s LIKE 'p%')` TRUE rows, so negation stays total
    * and two-valued (public Iceberg added NOT_STARTS_WITH for the same
    * reason). */
  case object NotStartsWith extends PredOp { def negate = StartsWith }
}

/** Boolean expression tree over named columns — the engine's filter IR
  * (reference api/.../expressions/Expressions.java DSL :37-250). Literals are
  * plain Scala values; `Exprs.bind` coerces them to the canonical value model
  * (dates → epoch days, timestamps → epoch micros, ints → widened as needed)
  * the way Literal.to(type) does (reference Literals.java:179-243).
  */
sealed trait Expr {
  def and(other: Expr): Expr = Exprs.and(this, other)
  def or(other: Expr): Expr = Exprs.or(this, other)
}
case object AlwaysTrue extends Expr
case object AlwaysFalse extends Expr
final case class And(left: Expr, right: Expr) extends Expr
final case class Or(left: Expr, right: Expr) extends Expr
final case class Not(child: Expr) extends Expr
/** Unbound predicate: `ref` is a column name. */
final case class Pred(op: PredOp, ref: String, values: Seq[Any] = Nil) extends Expr
/** Bound predicate: resolved field id + type, literals coerced. */
final case class BoundPred(op: PredOp, fieldId: Int, name: String,
    dt: DataType, values: Seq[Any]) extends Expr

object Exprs {
  def alwaysTrue: Expr = AlwaysTrue
  def alwaysFalse: Expr = AlwaysFalse
  def and(l: Expr, r: Expr): Expr = (l, r) match {
    case (AlwaysTrue, e) => e
    case (e, AlwaysTrue) => e
    case (AlwaysFalse, _) | (_, AlwaysFalse) => AlwaysFalse
    case _ => And(l, r)
  }
  def or(l: Expr, r: Expr): Expr = (l, r) match {
    case (AlwaysFalse, e) => e
    case (e, AlwaysFalse) => e
    case (AlwaysTrue, _) | (_, AlwaysTrue) => AlwaysTrue
    case _ => Or(l, r)
  }
  def not(e: Expr): Expr = e match {
    case AlwaysTrue => AlwaysFalse
    case AlwaysFalse => AlwaysTrue
    case Not(c) => c
    case _ => Not(e)
  }
  def isNull(c: String) = Pred(PredOp.IsNull, c)
  def notNull(c: String) = Pred(PredOp.NotNull, c)
  def lt(c: String, v: Any) = Pred(PredOp.Lt, c, Seq(v))
  def ltEq(c: String, v: Any) = Pred(PredOp.LtEq, c, Seq(v))
  def gt(c: String, v: Any) = Pred(PredOp.Gt, c, Seq(v))
  def gtEq(c: String, v: Any) = Pred(PredOp.GtEq, c, Seq(v))
  def equal(c: String, v: Any) = Pred(PredOp.Eq, c, Seq(v))
  def notEqual(c: String, v: Any) = Pred(PredOp.NotEq, c, Seq(v))
  def in(c: String, vs: Seq[Any]) = Pred(PredOp.In, c, vs)
  def notIn(c: String, vs: Seq[Any]) = Pred(PredOp.NotIn, c, vs)
  def startsWith(c: String, p: String) = Pred(PredOp.StartsWith, c, Seq(p))
  def notStartsWith(c: String, p: String) = Pred(PredOp.NotStartsWith, c, Seq(p))

  /** De Morgan push-down of Not to the leaves
    * (reference api/.../expressions/RewriteNot.java). Every PredOp has a
    * total negation (startsWith ↔ notStartsWith), so the rewrite fully
    * eliminates Not from predicate trees; bind and the projections still
    * treat a hypothetical surviving Not as terminal (recursing on an
    * unchanged node looped the planner forever, pre-round-16). */
  def rewriteNot(e: Expr): Expr = e match {
    case Not(And(l, r)) => Or(rewriteNot(not(l)), rewriteNot(not(r)))
    case Not(Or(l, r)) => And(rewriteNot(not(l)), rewriteNot(not(r)))
    case Not(Not(c)) => rewriteNot(c)
    case Not(Pred(op, ref, vs)) => Pred(op.negate, ref, vs)
    case Not(BoundPred(op, id, n, dt, vs)) => BoundPred(op.negate, id, n, dt, vs)
    case Not(AlwaysTrue) => AlwaysFalse
    case Not(AlwaysFalse) => AlwaysTrue
    case And(l, r) => And(rewriteNot(l), rewriteNot(r))
    case Or(l, r) => Or(rewriteNot(l), rewriteNot(r))
    case other => other
  }

  /** Coerce a user literal into the canonical domain of `dt`
    * (reference Literals.java `to()` :179-243). */
  def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: Int, LongType) => i.toLong
    case (i: Int, IntegerType) => i
    case (l: Long, LongType) => l
    case (l: Long, IntegerType) => l.toInt
    case (i: Int, DoubleType) => i.toDouble
    case (l: Long, DoubleType) => l.toDouble
    case (f: Float, DoubleType) => f.toDouble
    case (d: Double, DoubleType) => d
    case (f: Float, FloatType) => f
    case (d: Double, FloatType) => d.toFloat
    case (n: Number, _: DecimalType) => new java.math.BigDecimal(n.toString)
    case (b: java.math.BigDecimal, _: DecimalType) => b
    case (s: String, DateType) => LocalDate.parse(s).toEpochDay.toInt
    case (i: Int, DateType) => i
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: LocalDate, DateType) => d.toEpochDay.toInt
    case (s: String, TimestampType | TimestampNTZType) =>
      val norm = if (s.contains("T") || s.contains(" ")) s.replace(' ', 'T')
                 else s + "T00:00:00"
      val ldt = LocalDateTime.parse(norm)
      ldt.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L +
        ldt.getNano / 1000 % 1000
    case (l: Long, TimestampType | TimestampNTZType) => l
    case (t: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case (i: Instant, TimestampType | TimestampNTZType) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case (ldt: LocalDateTime, TimestampType | TimestampNTZType) =>
      ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
    // time canonical = nanos-of-day (Spark's internal TIME encoding)
    case (l: Long, _: TimeType) => l
    case (t: java.time.LocalTime, _: TimeType) => t.toNanoOfDay
    case (s: String, _: TimeType) => java.time.LocalTime.parse(s).toNanoOfDay
    case (s: String, StringType) => s
    case (b: Boolean, BooleanType) => b
    case (b: Array[Byte], BinaryType) => b
    case (other, t) =>
      throw new IllegalArgumentException(s"cannot coerce $other to $t")
  }

  /** Bind names to field ids against a schema, coercing literals
    * (reference Binder.java:59-93 + UnboundPredicate.bind). */
  def bind(e: Expr, schema: StructType, caseSensitive: Boolean = false): Expr =
    e match {
      case AlwaysTrue => AlwaysTrue
      case AlwaysFalse => AlwaysFalse
      case And(l, r) => and(bind(l, schema, caseSensitive), bind(r, schema, caseSensitive))
      case Or(l, r) => or(bind(l, schema, caseSensitive), bind(r, schema, caseSensitive))
      case Not(c) => rewriteNot(Not(c)) match {
        // irreducible (Not(startsWith)): bind the child, keep the Not —
        // recursing on the unchanged node looped forever
        case Not(inner) => not(bind(inner, schema, caseSensitive))
        case reduced => bind(reduced, schema, caseSensitive)
      }
      case p @ Pred(op, ref, vs) =>
        val f = schema.fields
          .find(f => if (caseSensitive) f.name == ref else f.name.equalsIgnoreCase(ref))
          .getOrElse(throw new IllegalArgumentException(
            s"cannot bind ${p.ref}: not in ${schema.fieldNames.mkString(",")}"))
        // null literals are rejected LOUDLY (reference Literals.from(null)
        // throws too): a null inside e.g. an Int IN-list would silently
        // unbox to 0 in the interpreted evaluator and prune/match the
        // wrong files. Use isNull/notNull for null checks; callers
        // converting external predicates drop or refuse nulls first.
        if (op != PredOp.IsNull && op != PredOp.NotNull)
          require(vs.forall(_ != null),
            s"cannot bind $ref: null literal in ${op} values " +
            "(use isNull/notNull for null checks)")
        BoundPred(op, FieldIds.idOf(f), f.name, f.dataType, vs.map(coerce(_, f.dataType)))
      case b: BoundPred => b
    }

  /** Codepoint-wise string comparison — identical to unsigned UTF-8 byte
    * order and to Spark's `UTF8String.compareTo`, the engine's string
    * comparison domain. */
  def compareUtf8(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Total order for canonical values of a type. */
  def ordering(dt: DataType): Ordering[Any] = {
    val o: Ordering[_] = dt match {
      case IntegerType | DateType => Ordering.Int
      case LongType | TimestampType | TimestampNTZType | _: TimeType =>
        Ordering.Long
      case DoubleType => Ordering.Double.TotalOrdering
      case FloatType => Ordering.Float.TotalOrdering
      // CODEPOINT order (== UTF-8 byte order == Spark's UTF8String
      // order), NOT Java's Ordering.String: Java compares UTF-16 code
      // units, which ranks astral-plane codepoints (surrogate pairs,
      // 0xD800-prefixed) BELOW U+E000..U+FFFF. File bounds come from
      // parquet/ORC footers in UTF-8 byte order and Spark compares row
      // values the same way — pruning with the UTF-16 order silently
      // LOSES rows whose bounds are astral (a file holding only "😀" is
      // "provably" below the literal "￿" and gets dropped for
      // s > '￿' even though its row matches).
      case StringType =>
        new Ordering[String] {
          def compare(a: String, b: String): Int = compareUtf8(a, b)
        }
      case BooleanType => Ordering.Boolean
      case _: DecimalType =>
        Ordering.comparatorToOrdering(
          java.util.Comparator.naturalOrder[java.math.BigDecimal]())
      case BinaryType =>
        new Ordering[Array[Byte]] {
          def compare(a: Array[Byte], b: Array[Byte]): Int =
            java.util.Arrays.compareUnsigned(a, b)
        }
      case t => throw new IllegalArgumentException(s"no ordering for $t")
    }
    o.asInstanceOf[Ordering[Any]]
  }

  /** Interpreted evaluation over a value lookup (partition tuples, tests) —
    * reference Evaluator.java:47-52. `get` returns the canonical value for a
    * field id (null allowed). */
  def eval(e: Expr, get: Int => Any): Boolean = e match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case Not(c) => !eval(c, get)
    case BoundPred(op, id, _, dt, vs) =>
      val v = get(id)
      op match {
        case PredOp.IsNull => v == null
        case PredOp.NotNull => v != null
        case _ if v == null => false
        case PredOp.Lt => ordering(dt).lt(v, vs.head)
        case PredOp.LtEq => ordering(dt).lteq(v, vs.head)
        case PredOp.Gt => ordering(dt).gt(v, vs.head)
        case PredOp.GtEq => ordering(dt).gteq(v, vs.head)
        case PredOp.Eq => ordering(dt).equiv(v, vs.head)
        case PredOp.NotEq => !ordering(dt).equiv(v, vs.head)
        case PredOp.In => vs.exists(ordering(dt).equiv(v, _))
        case PredOp.NotIn => !vs.exists(ordering(dt).equiv(v, _))
        case PredOp.StartsWith =>
          v.asInstanceOf[String].startsWith(vs.head.asInstanceOf[String])
        case PredOp.NotStartsWith => // null already handled: not TRUE
          !v.asInstanceOf[String].startsWith(vs.head.asInstanceOf[String])
      }
    case p: Pred => throw new IllegalStateException(s"unbound predicate: $p")
  }

  /** Translate a bound expr to a Spark Column (residual application — the
    * reference re-applies every pushed filter Spark-side as well,
    * spark3/.../SparkScanBuilder.java:121-123). */
  def toColumn(e: Expr): Column = e match {
    case AlwaysTrue => lit(true)
    case AlwaysFalse => lit(false)
    case And(l, r) => toColumn(l) && toColumn(r)
    case Or(l, r) => toColumn(l) || toColumn(r)
    case Not(c) => !toColumn(c)
    case BoundPred(op, _, name, dt, vs) =>
      val c = col(name)
      def l(v: Any): Column = litOf(v, dt)
      op match {
        case PredOp.IsNull => c.isNull
        case PredOp.NotNull => c.isNotNull
        case PredOp.Lt => c < l(vs.head)
        case PredOp.LtEq => c <= l(vs.head)
        case PredOp.Gt => c > l(vs.head)
        case PredOp.GtEq => c >= l(vs.head)
        case PredOp.Eq => c === l(vs.head)
        case PredOp.NotEq => c =!= l(vs.head)
        case PredOp.In => c.isInCollection(vs.map(v => litOf(v, dt)))
        case PredOp.NotIn => !c.isInCollection(vs.map(v => litOf(v, dt)))
        case PredOp.StartsWith => c.startsWith(vs.head.asInstanceOf[String])
        case PredOp.NotStartsWith => !c.startsWith(vs.head.asInstanceOf[String])
      }
    case p: Pred => throw new IllegalStateException(s"unbound predicate: $p")
  }

  /** Spark literal from a canonical value. */
  def litOf(v: Any, dt: DataType): Column = dt match {
    case DateType => lit(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
    case TimestampType =>
      // an Instant literal IS a TIMESTAMP literal (zone-free stored
      // micros). A LocalDateTime here would type as TIMESTAMP_NTZ and the
      // implicit cast back to TIMESTAMP applies the SESSION zone — under
      // any non-UTC session the residual filter shifted by the offset and
      // silently dropped every matching row (TableFormatSpec non-UTC test)
      val us = v.asInstanceOf[Long]
      lit(java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L))
    case TimestampNTZType =>
      val us = v.asInstanceOf[Long]
      lit(LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000).toInt, ZoneOffset.UTC))
    case _: TimeType => // canonical nanos-of-day
      lit(java.time.LocalTime.ofNanoOfDay(v.asInstanceOf[Long]))
    case _ => lit(v)
  }

  /** Column names referenced by an expression. */
  def references(e: Expr): Set[String] = e match {
    case And(l, r) => references(l) ++ references(r)
    case Or(l, r) => references(l) ++ references(r)
    case Not(c) => references(c)
    case Pred(_, ref, _) => Set(ref)
    case BoundPred(_, _, name, _, _) => Set(name)
    case _ => Set.empty
  }
}
