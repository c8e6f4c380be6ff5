package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import scala.util.Random

/** Property tests for the pruning kernel — the reference's randomized test
  * strategy (SURVEY §5.3) applied to evaluators. Seeded generators, 3000
  * cases per property:
  *  - inclusive pruning must NEVER drop a file containing a matching row;
  *  - strict matching must NEVER claim a file whose rows don't all match;
  *  - partition projections must stay sound through every transform.
  */
class PruningPropertySpec extends AnyFunSuite {

  private val schema = FieldIds.assignFresh(StructType(Seq(
    StructField("v", LongType), StructField("s", StringType))))
  private val vId = 1
  private val N = 3000

  private def statsOf(rows: Seq[Option[Long]]): DataFile = {
    val nonNull = rows.flatten
    DataFile(path = "f",
      recordCount = rows.size.toLong,
      valueCounts = Map(vId -> rows.size.toLong),
      nullValueCounts = Map(vId -> rows.count(_.isEmpty).toLong),
      lowerBounds = if (nonNull.isEmpty) Map.empty else Map(vId -> nonNull.min),
      upperBounds = if (nonNull.isEmpty) Map.empty else Map(vId -> nonNull.max))
  }

  private def genRows(r: Random): List[Option[Long]] =
    List.fill(1 + r.nextInt(8))(
      if (r.nextInt(5) == 0) None else Some(r.nextLong(101) - 50))

  private def genPred(r: Random): Expr = {
    def v = r.nextLong(121) - 60
    r.nextInt(10) match {
      case 0 => Exprs.lt("v", v)
      case 1 => Exprs.ltEq("v", v)
      case 2 => Exprs.gt("v", v)
      case 3 => Exprs.gtEq("v", v)
      case 4 => Exprs.equal("v", v)
      case 5 => Exprs.notEqual("v", v)
      case 6 => Exprs.in("v", Seq(v, v, v))
      case 7 => Exprs.notIn("v", Seq(v, v, v))
      case 8 => Exprs.isNull("v")
      case 9 => Exprs.notNull("v")
    }
  }

  private def genExpr(r: Random): Expr = r.nextInt(4) match {
    case 0 => genPred(r)
    case 1 => Exprs.and(genPred(r), genPred(r))
    case 2 => Exprs.or(genPred(r), genPred(r))
    case 3 => Exprs.not(genPred(r))
  }

  private def matches(e: Expr, row: Option[Long]): Boolean =
    Exprs.eval(e, _ => row.map(Long.box).orNull)

  test("inclusive metrics never prune a file with a matching row") {
    val r = new Random(42)
    (0 until N).foreach { _ =>
      val rows = genRows(r)
      val bound = Exprs.bind(Exprs.rewriteNot(genExpr(r)), schema)
      val f = statsOf(rows)
      if (rows.exists(matches(bound, _)))
        assert(Evaluators.inclusiveMetrics(bound, f),
          s"pruned file with matching rows: rows=$rows expr=$bound")
    }
  }

  test("strict metrics never claim a file with a non-matching row") {
    val r = new Random(43)
    (0 until N).foreach { _ =>
      val rows = genRows(r)
      val bound = Exprs.bind(Exprs.rewriteNot(genExpr(r)), schema)
      val f = statsOf(rows)
      if (Evaluators.strictMetrics(bound, f))
        assert(rows.forall(matches(bound, _)),
          s"strict over-claimed: rows=$rows expr=$bound")
    }
  }

  private val transforms: Seq[Transform] = Seq(
    Transforms.IdentityT, Transforms.BucketT(7), Transforms.TruncateT(10))

  test("inclusive partition projection keeps partitions with matching rows") {
    val r = new Random(44)
    (0 until N).foreach { _ =>
      val rows = genRows(r)
      val tr = transforms(r.nextInt(transforms.size))
      val spec = PartitionSpec(0, Seq(PartitionField(vId, tr, "p")))
      val bound = Exprs.bind(Exprs.rewriteNot(genExpr(r)), schema)
      val projected = Projections.inclusive(bound, spec, schema)
      rows.foreach { row =>
        val tuple = Map("p" -> row.map(v => tr.apply(v, LongType)).orNull)
        if (matches(bound, row))
          assert(Projections.evalOnPartition(projected, tuple),
            s"projection pruned matching row=$row tr=$tr expr=$bound proj=$projected")
      }
    }
  }

  test("strict partition projection only claims fully-matching partitions") {
    val r = new Random(45)
    (0 until N).foreach { _ =>
      val rows = genRows(r)
      val tr = transforms(r.nextInt(transforms.size))
      val spec = PartitionSpec(0, Seq(PartitionField(vId, tr, "p")))
      val bound = Exprs.bind(Exprs.rewriteNot(genExpr(r)), schema)
      val projected = Projections.strict(bound, spec, schema)
      rows.groupBy(row => row.map(v => tr.apply(v, LongType)).orNull)
        .foreach { case (pval, rs) =>
          if (Projections.evalOnPartition(projected, Map("p" -> pval)))
            assert(rs.forall(matches(bound, _)),
              s"strict projection over-claimed pval=$pval rows=$rs tr=$tr expr=$bound")
        }
    }
  }

  test("string partition projections sound (startsWith / notStartsWith × truncate)") {
    val r = new Random(49)
    val sId = 2
    def genS(): String = {
      val alphabet = "ab"
      (0 until r.nextInt(7)).map(_ => alphabet(r.nextInt(2))).mkString
    }
    val strTransforms: Seq[Transform] =
      Seq(Transforms.IdentityT, Transforms.TruncateT(3), Transforms.BucketT(5))
    (0 until N).foreach { _ =>
      val rows: List[Option[String]] =
        List.fill(1 + r.nextInt(8))(
          if (r.nextInt(5) == 0) None else Some(genS()))
      val tr = strTransforms(r.nextInt(strTransforms.size))
      val spec = PartitionSpec(0, Seq(PartitionField(sId, tr, "p")))
      val pred = r.nextInt(4) match {
        case 0 => Exprs.startsWith("s", genS().take(1 + r.nextInt(5)))
        // prefix length crosses the truncate(3) width both ways
        case 1 => Exprs.notStartsWith("s", genS().take(1 + r.nextInt(5)))
        case 2 => Exprs.equal("s", genS())
        case 3 => Exprs.lt("s", genS())
      }
      val bound = Exprs.bind(Exprs.rewriteNot(
        if (r.nextBoolean()) pred else Exprs.not(pred)), schema)
      def rowMatches(row: Option[String]): Boolean =
        Exprs.eval(bound, _ => row.orNull)
      val inc = Projections.inclusive(bound, spec, schema)
      val str = Projections.strict(bound, spec, schema)
      rows.groupBy(row => row.map(v => tr.apply(v, StringType)).orNull)
        .foreach { case (pval, rs) =>
          val tuple = Map("p" -> pval)
          if (rs.exists(rowMatches))
            assert(inc == AlwaysTrue || Projections.evalOnPartition(inc, tuple),
              s"inclusive pruned matching partition pval=$pval rows=$rs tr=$tr expr=$bound proj=$inc")
          if (str != AlwaysFalse && Projections.evalOnPartition(str, tuple))
            assert(rs.forall(rowMatches),
              s"strict over-claimed pval=$pval rows=$rs tr=$tr expr=$bound proj=$str")
        }
    }
  }

  test("string metrics pruning sound under truncate(16) bounds + startsWith") {
    val r = new Random(47)
    val sId = 2
    def genStr(): String = {
      val alphabet = "abz"
      (0 until 1 + r.nextInt(24)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    }
    (0 until N).foreach { _ =>
      val rows = List.fill(1 + r.nextInt(6))(
        if (r.nextInt(6) == 0) None else Some(genStr()))
      val nonNull = rows.flatten
      val f = DataFile(path = "f",
        recordCount = rows.size.toLong,
        valueCounts = Map(sId -> rows.size.toLong),
        nullValueCounts = Map(sId -> rows.count(_.isEmpty).toLong),
        lowerBounds = if (nonNull.isEmpty) Map.empty
          else Map(sId -> Metrics.truncateLower(nonNull.min)),
        upperBounds = if (nonNull.isEmpty) Map.empty
          else Option(Metrics.truncateUpper(nonNull.max)).map(sId -> _).toMap)
      val pred = r.nextInt(8) match {
        case 0 => Exprs.lt("s", genStr())
        case 1 => Exprs.ltEq("s", genStr())
        case 2 => Exprs.gt("s", genStr())
        case 3 => Exprs.gtEq("s", genStr())
        case 4 => Exprs.equal("s", genStr())
        case 5 => Exprs.startsWith("s", genStr().take(1 + r.nextInt(5)))
        case 6 => Exprs.in("s", Seq(genStr(), genStr()))
        // prefixes both inside and beyond the 16-char truncation width:
        // the notStartsWith evaluators' length guards must hold on
        // truncated bounds
        case 7 => Exprs.notStartsWith("s", genStr().take(1 + r.nextInt(19)))
      }
      val bound = Exprs.bind(pred, schema)
      def matches(row: Option[String]): Boolean =
        Exprs.eval(bound, _ => row.orNull)
      if (rows.exists(matches))
        assert(Evaluators.inclusiveMetrics(bound, f),
          s"pruned matching file: rows=$rows expr=$bound file=$f")
      if (Evaluators.strictMetrics(bound, f))
        assert(rows.forall(matches),
          s"strict over-claimed: rows=$rows expr=$bound file=$f")
    }
  }

  test("bind rejects null literals loudly (no silent unbox-to-zero)") {
    // a null inside an Int/Long IN-list would unbox to 0 in the
    // interpreted evaluator and match/prune the wrong files — binding
    // must refuse instead (reference Literals.from(null) throws too)
    for (bad <- Seq(Exprs.in("v", Seq(1L, null)),
                    Exprs.equal("v", null),
                    Exprs.notIn("v", Seq(null)))) {
      val e = intercept[IllegalArgumentException](Exprs.bind(bad, schema))
      assert(e.getMessage.contains("null literal"), s"got: $e")
    }
    // null CHECKS still bind
    assert(Exprs.bind(Exprs.isNull("v"), schema).isInstanceOf[BoundPred])
    assert(Exprs.bind(Exprs.notNull("v"), schema).isInstanceOf[BoundPred])
  }

  test("compareUtf8 == UTF8String.compareTo on random unicode (property)") {
    // the engine's string comparator must be bit-for-bit the same ORDER
    // as Spark's — randomized across BMP, astral, surrogate-adjacent and
    // empty strings
    import org.apache.spark.unsafe.types.UTF8String
    val r = new Random(50)
    val cps = Array(0x41, 0x7A, 0xE9, 0x2713, 0xD7FF, 0xE000, 0xFFFD,
      0xFFFF, 0x10000, 0x1F600, 0x10FFFF)
    def genS(): String = {
      val sb = new java.lang.StringBuilder
      (0 until r.nextInt(6)).foreach(_ => sb.appendCodePoint(cps(r.nextInt(cps.length))))
      sb.toString
    }
    (0 until N).foreach { _ =>
      val a = genS(); val b = genS()
      val got = Integer.signum(Exprs.compareUtf8(a, b))
      val want = Integer.signum(
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      assert(got === want,
        s"order mismatch on ${a.codePoints.toArray.toSeq} vs ${b.codePoints.toArray.toSeq}")
    }
  }

  test("string metrics pruning is sound under UTF-8 order (astral codepoints)") {
    // the engine's string comparison domain is UTF-8 byte order (parquet
    // footer bounds, Spark row comparisons). Oracle: Spark's UTF8String
    // comparator — an INDEPENDENT implementation of that order. Java's
    // String ordering disagrees on astral-vs-[U+E000,U+FFFF] pairs, the
    // exact region this alphabet saturates; an evaluator on the Java
    // order loses rows here (inclusive) or over-claims (strict).
    import org.apache.spark.unsafe.types.UTF8String
    val sId = 2
    val alphabet = Seq("", "a", "ab", "z",
      "\ue000",           // high BMP, above every surrogate code unit
      "\uffff",           // max BMP codepoint
      "\ud83d\ude00",     // U+1F600 (astral)
      "\ud83d\ude80x",    // U+1F680 + ascii tail
      "a\ud83d\ude00", "\uffffb",
      "\ud83d\ude00\ud83d\ude00a")
    def cmp(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    def statsOfS(rows: Seq[Option[String]], truncate: Boolean): DataFile = {
      val nn = rows.flatten
      def minS = nn.reduce((x, y) => if (cmp(x, y) <= 0) x else y)
      def maxS = nn.reduce((x, y) => if (cmp(x, y) >= 0) x else y)
      val lo = if (nn.isEmpty) None
        else Some(if (truncate) Metrics.truncateLower(minS, 2) else minS)
      val hi = if (nn.isEmpty) None
        else Option(if (truncate) Metrics.truncateUpper(maxS, 2) else maxS)
      DataFile(path = "f", recordCount = rows.size.toLong,
        valueCounts = Map(sId -> rows.size.toLong),
        nullValueCounts = Map(sId -> rows.count(_.isEmpty).toLong),
        lowerBounds = lo.map(v => Map(sId -> v)).getOrElse(Map.empty),
        upperBounds = hi.map(v => Map(sId -> v)).getOrElse(Map.empty))
    }
    def genS(r: Random): Option[String] =
      if (r.nextInt(6) == 0) None else Some(alphabet(r.nextInt(alphabet.size)))
    def genPredS(r: Random): Expr = {
      def lit = alphabet(r.nextInt(alphabet.size))
      r.nextInt(12) match {
        case 0 => Exprs.lt("s", lit)
        case 1 => Exprs.ltEq("s", lit)
        case 2 => Exprs.gt("s", lit)
        case 3 => Exprs.gtEq("s", lit)
        case 4 => Exprs.equal("s", lit)
        case 5 => Exprs.notEqual("s", lit)
        case 6 => Exprs.in("s", Seq(lit, lit))
        case 7 => Exprs.notIn("s", Seq(lit, lit))
        case 8 => Exprs.startsWith("s", lit)
        case 9 => Exprs.notStartsWith("s", lit)
        case 10 => Exprs.isNull("s")
        case 11 => Exprs.notNull("s")
      }
    }
    // independent row oracle: UTF8String comparisons + exact startsWith
    def rowMatch(e: Expr, row: Option[String]): Boolean = e match {
      case BoundPred(op, _, _, _, vs) =>
        val lits = vs.map(_.asInstanceOf[String])
        (op, row) match {
          case (PredOp.IsNull, None) => true
          case (PredOp.IsNull, Some(_)) => false
          case (PredOp.NotNull, o) => o.isDefined
          case (_, None) => false
          case (PredOp.Lt, Some(v)) => cmp(v, lits.head) < 0
          case (PredOp.LtEq, Some(v)) => cmp(v, lits.head) <= 0
          case (PredOp.Gt, Some(v)) => cmp(v, lits.head) > 0
          case (PredOp.GtEq, Some(v)) => cmp(v, lits.head) >= 0
          case (PredOp.Eq, Some(v)) => v == lits.head
          case (PredOp.NotEq, Some(v)) => v != lits.head
          case (PredOp.In, Some(v)) => lits.contains(v)
          case (PredOp.NotIn, Some(v)) => !lits.contains(v)
          case (PredOp.StartsWith, Some(v)) => v.startsWith(lits.head)
          case (PredOp.NotStartsWith, Some(v)) => !v.startsWith(lits.head)
          case _ => fail(s"unexpected $op")
        }
      case other => fail(s"expected a bound pred, got $other")
    }
    val r = new Random(48)
    (0 until N).foreach { _ =>
      val rows = List.fill(1 + r.nextInt(6))(genS(r))
      val bound = Exprs.bind(genPredS(r), schema)
      Seq(false, true).foreach { trunc =>
        val f = statsOfS(rows, trunc)
        if (rows.exists(rowMatch(bound, _)))
          assert(Evaluators.inclusiveMetrics(bound, f),
            s"pruned a matching row: rows=$rows expr=$bound trunc=$trunc " +
              s"bounds=${f.lowerBounds}/${f.upperBounds}")
        if (Evaluators.strictMetrics(bound, f))
          assert(rows.forall(rowMatch(bound, _)),
            s"strict over-claimed: rows=$rows expr=$bound trunc=$trunc " +
              s"bounds=${f.lowerBounds}/${f.upperBounds}")
      }
    }
  }

  test("string bound truncation keeps bounds valid (UnicodeUtil semantics)") {
    val r = new Random(46)
    (0 until N).foreach { _ =>
      val len = 1 + r.nextInt(30)
      val s = (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString +
        (if (r.nextInt(4) == 0) "😀" else "") // astral codepoint
      val lo = Metrics.truncateLower(s).asInstanceOf[String]
      val hi = Metrics.truncateUpper(s)
      assert(lo <= s, s"lower bound above value: $lo > $s")
      if (hi != null)
        assert(hi.asInstanceOf[String] > s || hi == s,
          s"upper bound below value: $hi < $s")
    }
  }
}
