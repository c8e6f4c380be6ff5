package graft.connector

import graft.format._
import org.apache.spark.sql.{sources => sf}
import org.apache.spark.sql.sources.{Filter, EqualTo, EqualNullSafe, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In, IsNull, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property test for the WHOLE filter-conversion pipeline: random
  * `sources.Filter` trees (NOTs, nulls in literals, every convertible leaf)
  * against a reference three-valued SQL evaluator. For every convertible
  * filter, the bound graft expression's two-valued row evaluation must
  * select exactly SQL's TRUE rows — the polarity rule, the null-literal
  * rule, and bind termination (the round-16 `NOT LIKE` planner loop was
  * exactly a termination failure) all fall out of this one property. */
class FilterBridgePropertySpec extends AnyFunSuite {

  private val schema = FieldIds.assignFresh(StructType(Seq(
    StructField("a", LongType), StructField("s", StringType))))

  // ---- reference 3VL evaluator over sources.Filter ----
  private sealed trait TV
  private case object True extends TV
  private case object False extends TV
  private case object Unknown extends TV
  private def bool(b: Boolean): TV = if (b) True else False

  private def kleeneAnd(l: TV, r: TV): TV = (l, r) match {
    case (False, _) | (_, False) => False
    case (True, True) => True
    case _ => Unknown
  }
  private def kleeneOr(l: TV, r: TV): TV = (l, r) match {
    case (True, _) | (_, True) => True
    case (False, False) => False
    case _ => Unknown
  }
  private def kleeneNot(v: TV): TV = v match {
    case True => False
    case False => True
    case Unknown => Unknown
  }

  private def cmp(x: Any, y: Any): Int = (x, y) match {
    case (a: Long, b: Long) => java.lang.Long.compare(a, b)
    case (a: String, b: String) => a.compareTo(b)
    case other => sys.error(s"cmp $other")
  }

  private def ref(f: Filter, row: Map[String, Any]): TV = f match {
    case EqualTo(a, v) =>
      if (row(a) == null || v == null) Unknown else bool(cmp(row(a), v) == 0)
    case EqualNullSafe(a, v) => bool(row(a) == v)
    case GreaterThan(a, v) =>
      if (row(a) == null || v == null) Unknown else bool(cmp(row(a), v) > 0)
    case GreaterThanOrEqual(a, v) =>
      if (row(a) == null || v == null) Unknown else bool(cmp(row(a), v) >= 0)
    case LessThan(a, v) =>
      if (row(a) == null || v == null) Unknown else bool(cmp(row(a), v) < 0)
    case LessThanOrEqual(a, v) =>
      if (row(a) == null || v == null) Unknown else bool(cmp(row(a), v) <= 0)
    case In(a, vs) =>
      if (row(a) == null) Unknown
      else if (vs.exists(v => v != null && cmp(row(a), v) == 0)) True
      else if (vs.contains(null)) Unknown
      else False
    case IsNull(a) => bool(row(a) == null)
    case IsNotNull(a) => bool(row(a) != null)
    case StringStartsWith(a, p) =>
      if (row(a) == null) Unknown
      else bool(row(a).asInstanceOf[String].startsWith(p))
    case sf.And(l, r) => kleeneAnd(ref(l, row), ref(r, row))
    case sf.Or(l, r) => kleeneOr(ref(l, row), ref(r, row))
    case sf.Not(c) => kleeneNot(ref(c, row))
    case other => sys.error(s"unexpected filter $other")
  }

  // ---- random generators ----
  private val longs: Seq[Any] = Seq(null, 0L, 1L, 2L, 3L, 5L)
  private val strings: Seq[Any] = Seq(null, "", "p", "px", "q", "qx")

  private def genLeaf(r: Random): Filter = {
    def lv: Any = longs(r.nextInt(longs.size))
    def sv: Any = strings(r.nextInt(strings.size))
    r.nextInt(12) match {
      case 0 => EqualTo("a", lv)
      case 1 => EqualNullSafe("a", lv)
      case 2 => GreaterThan("a", lv)
      case 3 => GreaterThanOrEqual("a", lv)
      case 4 => LessThan("a", lv)
      case 5 => LessThanOrEqual("a", lv)
      case 6 => In("a", Array.fill(1 + r.nextInt(3))(lv))
      case 7 => IsNull(if (r.nextBoolean()) "a" else "s")
      case 8 => IsNotNull(if (r.nextBoolean()) "a" else "s")
      case 9 => StringStartsWith("s", Seq("", "p", "q")(r.nextInt(3)))
      case 10 => EqualTo("s", sv)
      case 11 => In("s", Array.fill(1 + r.nextInt(3))(sv))
    }
  }

  private def gen(r: Random, depth: Int): Filter =
    if (depth == 0 || r.nextInt(3) == 0) genLeaf(r)
    else r.nextInt(3) match {
      case 0 => sf.And(gen(r, depth - 1), gen(r, depth - 1))
      case 1 => sf.Or(gen(r, depth - 1), gen(r, depth - 1))
      case 2 => sf.Not(gen(r, depth - 1))
    }

  private val rows: Seq[Map[String, Any]] =
    for (a <- longs; s <- strings) yield Map("a" -> a, "s" -> s)

  test("convertible filters select exactly SQL's TRUE rows (3000 random trees)") {
    val r = new Random(47)
    var converted = 0
    (0 until 3000).foreach { _ =>
      val f = gen(r, 4)
      FilterBridge.convert(f).foreach { e =>
        converted += 1
        val bound = Exprs.bind(e, schema) // must terminate and accept
        val nameToId = FieldIds.nameToId(schema)
        val idToName = nameToId.map(_.swap)
        rows.foreach { row =>
          val got = Exprs.eval(bound, id => row(idToName(id)))
          val want = ref(f, row) == True
          assert(got == want,
            s"filter=$f row=$row converted=$e bound=$bound: got $got want $want")
        }
      }
    }
    // the generator must actually exercise the convertible space
    assert(converted > 1000, s"only $converted trees converted")
  }

  test("convertAll under a residual is a superset filter (never drops a TRUE row)") {
    val r = new Random(48)
    (0 until 1500).foreach { _ =>
      val fs = Array.fill(1 + r.nextInt(3))(gen(r, 3))
      val bound = Exprs.bind(FilterBridge.convertAll(fs), schema)
      val nameToId = FieldIds.nameToId(schema)
      val idToName = nameToId.map(_.swap)
      rows.foreach { row =>
        val allTrue = fs.forall(f => ref(f, row) == True)
        if (allTrue) // a row every original filter selects must survive
          assert(Exprs.eval(bound, id => row(idToName(id))),
            s"filters=${fs.mkString(";")} row=$row dropped a TRUE row")
      }
    }
  }
}
