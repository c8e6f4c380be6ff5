package graft.format

import org.apache.spark.sql.types._

/** Planning-time pruning evaluators.
  *
  * - `InclusiveMetricsEvaluator`: "rows might match" from per-file
  *   value/null counts + lower/upper bounds (reference
  *   api/.../expressions/InclusiveMetricsEvaluator.java:48-344).
  * - `StrictMetricsEvaluator`: "ALL rows match" — powers metadata-only
  *   DELETE/overwrite validation (reference StrictMetricsEvaluator.java).
  * - `ManifestEvaluator`: manifest-level pruning from partition-field
  *   summaries (reference ManifestEvaluator.java).
  *
  * All take *bound* expressions. Conservative on missing stats: inclusive
  * answers true, strict answers false.
  */
object Evaluators {

  private val RowsMightMatch = true
  private val RowsCannotMatch = false

  /** rows-might-match over a file's stats. */
  def inclusiveMetrics(expr: Expr, f: DataFile): Boolean = expr match {
    case AlwaysTrue => RowsMightMatch
    case AlwaysFalse => RowsCannotMatch
    case And(l, r) => inclusiveMetrics(l, f) && inclusiveMetrics(r, f)
    case Or(l, r) => inclusiveMetrics(l, f) || inclusiveMetrics(r, f)
    case Not(c) => RowsMightMatch // bound exprs are NOT-rewritten; be safe
    case p: Pred => throw new IllegalStateException(s"unbound: $p")
    case BoundPred(op, id, _, dt, vs) =>
      val ord = Exprs.ordering(dt)
      val valueCount = f.valueCounts.get(id)
      val nullCount = f.nullValueCounts.get(id)
      val lower = f.lowerBounds.get(id)
      val upper = f.upperBounds.get(id)
      def allNull: Boolean = (valueCount, nullCount) match {
        case (Some(vc), Some(nc)) => vc == nc && vc > 0
        case _ => false
      }
      op match {
        case PredOp.IsNull =>
          if (nullCount.contains(0L)) RowsCannotMatch else RowsMightMatch
        case PredOp.NotNull =>
          if (allNull) RowsCannotMatch else RowsMightMatch
        case _ if allNull => RowsCannotMatch
        case PredOp.Lt => // no row < v if lower >= v  (ref :144-158)
          lower match {
            case Some(lo) if ord.gteq(lo, vs.head) => RowsCannotMatch
            case _ => RowsMightMatch
          }
        case PredOp.LtEq =>
          lower match {
            case Some(lo) if ord.gt(lo, vs.head) => RowsCannotMatch
            case _ => RowsMightMatch
          }
        case PredOp.Gt =>
          upper match {
            case Some(up) if ord.lteq(up, vs.head) => RowsCannotMatch
            case _ => RowsMightMatch
          }
        case PredOp.GtEq =>
          upper match {
            case Some(up) if ord.lt(up, vs.head) => RowsCannotMatch
            case _ => RowsMightMatch
          }
        case PredOp.Eq => // ref :232-247
          if (lower.exists(lo => ord.gt(lo, vs.head)) ||
              upper.exists(up => ord.lt(up, vs.head))) RowsCannotMatch
          else RowsMightMatch
        case PredOp.NotEq => RowsMightMatch // can't prune (ref :261-267)
        case PredOp.In => // ref :268-292
          val any = vs.exists { v =>
            !(lower.exists(lo => ord.gt(lo, v)) || upper.exists(up => ord.lt(up, v)))
          }
          if (any) RowsMightMatch else RowsCannotMatch
        case PredOp.NotIn => RowsMightMatch
        case PredOp.StartsWith => // truncated-bound compare (ref :304-330)
          val prefix = vs.head.asInstanceOf[String]
          def boundMismatch(b: Option[Any], isLower: Boolean): Boolean = b match {
            case Some(s: String) =>
              // compare equal-CODEPOINT prefixes with the engine's UTF-8
              // order (a UTF-16 cut could split a surrogate pair, and
              // Java's compareTo disagrees with the footer-bound order
              // on astral codepoints)
              val cmpCps = math.min(s.codePointCount(0, s.length),
                prefix.codePointCount(0, prefix.length))
              val cmp = Exprs.compareUtf8(
                s.substring(0, s.offsetByCodePoints(0, cmpCps)),
                prefix.substring(0, prefix.offsetByCodePoints(0, cmpCps)))
              if (isLower) cmp > 0 else cmp < 0
            case _ => false
          }
          if (boundMismatch(lower, isLower = true) ||
              boundMismatch(upper, isLower = false)) RowsCannotMatch
          else RowsMightMatch
        case PredOp.NotStartsWith =>
          // no row matches iff EVERY value starts with the prefix (null
          // rows never match notStartsWith). Sound with truncated bounds:
          // the lower bound is a PREFIX of the real minimum, and an
          // incremented upper that still starts with the prefix forces
          // every in-range value's first |prefix| chars to equal it
          // (public Iceberg InclusiveMetricsEvaluator.notStartsWith).
          (lower, upper) match {
            case (Some(lo: String), Some(up: String))
                if lo.length >= vs.head.asInstanceOf[String].length &&
                   up.length >= vs.head.asInstanceOf[String].length &&
                   lo.startsWith(vs.head.asInstanceOf[String]) &&
                   up.startsWith(vs.head.asInstanceOf[String]) =>
              RowsCannotMatch
            case _ => RowsMightMatch
          }
      }
  }

  /** all-rows-match over a file's stats (strict). */
  def strictMetrics(expr: Expr, f: DataFile): Boolean = expr match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => strictMetrics(l, f) && strictMetrics(r, f)
    case Or(l, r) => strictMetrics(l, f) || strictMetrics(r, f)
    case Not(_) => false
    case p: Pred => throw new IllegalStateException(s"unbound: $p")
    case BoundPred(op, id, _, dt, vs) =>
      val ord = Exprs.ordering(dt)
      val nullCount = f.nullValueCounts.get(id)
      val valueCount = f.valueCounts.get(id)
      val lower = f.lowerBounds.get(id)
      val upper = f.upperBounds.get(id)
      val noNulls = nullCount.contains(0L)
      def allNull: Boolean = (valueCount, nullCount) match {
        case (Some(vc), Some(nc)) => vc == nc && vc > 0
        case _ => false
      }
      op match {
        case PredOp.IsNull => allNull
        case PredOp.NotNull => noNulls
        case PredOp.Lt => // every row < v iff upper < v, no nulls
          noNulls && upper.exists(up => ord.lt(up, vs.head))
        case PredOp.LtEq => noNulls && upper.exists(up => ord.lteq(up, vs.head))
        case PredOp.Gt => noNulls && lower.exists(lo => ord.gt(lo, vs.head))
        case PredOp.GtEq => noNulls && lower.exists(lo => ord.gteq(lo, vs.head))
        case PredOp.Eq =>
          noNulls && lower.isDefined && upper.isDefined &&
            ord.equiv(lower.get, vs.head) && ord.equiv(upper.get, vs.head)
        case PredOp.NotEq =>
          noNulls && (lower.exists(lo => ord.gt(lo, vs.head)) ||
            upper.exists(up => ord.lt(up, vs.head)))
        case PredOp.In =>
          noNulls && lower.isDefined && upper.isDefined &&
            ord.equiv(lower.get, upper.get) &&
            vs.exists(ord.equiv(lower.get, _))
        case PredOp.NotIn =>
          noNulls && vs.forall { v =>
            lower.exists(lo => ord.gt(lo, v)) || upper.exists(up => ord.lt(up, v))
          }
        case PredOp.StartsWith =>
          // every row starts with the prefix: same bound logic as the
          // inclusive notStartsWith cannot-match (plus no nulls)
          noNulls && {
            val prefix = vs.head.asInstanceOf[String]
            (lower, upper) match {
              case (Some(lo: String), Some(up: String)) =>
                lo.length >= prefix.length && up.length >= prefix.length &&
                  lo.startsWith(prefix) && up.startsWith(prefix)
              case _ => false
            }
          }
        case PredOp.NotStartsWith =>
          // every row is non-null and outside the prefix block [p, succ p):
          // upper entirely below p, or the real minimum's first |p| chars
          // already above p (lower bounds are prefixes of the real min)
          noNulls && {
            val prefix = vs.head.asInstanceOf[String]
            val pCps = prefix.codePointCount(0, prefix.length)
            upper.exists { case up: String => Exprs.compareUtf8(up, prefix) < 0
                           case _ => false } ||
            lower.exists { case lo: String =>
                             lo.codePointCount(0, lo.length) >= pCps &&
                               Exprs.compareUtf8(
                                 lo.substring(0, lo.offsetByCodePoints(0, pCps)),
                                 prefix) > 0
                           case _ => false }
          }
      }
  }

  /** Manifest-level pruning: evaluate the *inclusive partition projection*
    * against per-field summaries (reference ManifestEvaluator.java). The
    * projected expr references partition fields by name; `types` gives each
    * field's result type, `sums` the summaries in spec-field order. */
  def manifestMightMatch(projected: Expr, spec: PartitionSpec,
      sums: Seq[FieldSummary], types: Seq[(String, DataType)]): Boolean = {
    if (sums.isEmpty) return true
    val byName: Map[String, (FieldSummary, DataType)] =
      spec.fields.map(_.name).zip(sums.zip(types.map(_._2))).toMap
    def go(e: Expr): Boolean = e match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => go(l) && go(r)
      case Or(l, r) => go(l) || go(r)
      case Not(_) => true
      case BoundPred(op, _, name, dt, vs) =>
        byName.get(name) match {
          case None => true
          case Some((sum, fdt)) =>
            // treat the summary as a one-column "file" and reuse inclusive logic
            // valueCount=2 keeps the all-null shortcut off (containsNull=true
            // only means SOME nulls; the summary can't prove all-null)
            val pseudo = DataFile(path = "",
              valueCounts = Map(0 -> 2L),
              nullValueCounts = Map(0 -> (if (sum.containsNull) 1L else 0L)),
              lowerBounds = Option(sum.lower).map(v => Map(0 -> v)).getOrElse(Map.empty),
              upperBounds = Option(sum.upper).map(v => Map(0 -> v)).getOrElse(Map.empty))
            inclusiveMetrics(BoundPred(op, 0, name, fdt, vs), pseudo)
        }
      case p: Pred => throw new IllegalStateException(s"unbound: $p")
    }
    go(projected)
  }
}
