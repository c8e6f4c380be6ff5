package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.util.Random

/** The library scan applies bound expressions as Spark Columns
  * (`Exprs.toColumn`, three-valued logic) while every pruning decision
  * (metrics, projections, metadata deletes) reasons with the interpreted
  * evaluator (`Exprs.eval`, two-valued). For the expressions the engine
  * actually produces — Not-free, null-literal-free (bind enforces both) —
  * the two MUST select identical rows, or pruning keeps/claims files the
  * residual then filters differently. This spec pins that agreement over
  * random trees and a null-heavy row domain, in ONE Spark job (all
  * expressions evaluated as columns of a single projection). */
class ResidualAgreementSpec extends SparkSpec {
  import spark.implicits._

  private val schema = FieldIds.assignFresh(StructType(Seq(
    StructField("a", LongType), StructField("s", StringType))))

  private def genPred(r: Random): Expr = {
    def lv = r.nextLong(7) // small domain → frequent bound hits
    def sv = Seq("", "p", "px", "q", "qx")(r.nextInt(5))
    r.nextInt(13) match {
      case 0 => Exprs.lt("a", lv)
      case 1 => Exprs.ltEq("a", lv)
      case 2 => Exprs.gt("a", lv)
      case 3 => Exprs.gtEq("a", lv)
      case 4 => Exprs.equal("a", lv)
      case 5 => Exprs.notEqual("a", lv)
      case 6 => Exprs.in("a", Seq(lv, lv))
      case 7 => Exprs.notIn("a", Seq(lv, lv))
      case 8 => Exprs.isNull(if (r.nextBoolean()) "a" else "s")
      case 9 => Exprs.notNull(if (r.nextBoolean()) "a" else "s")
      case 10 => Exprs.startsWith("s", Seq("", "p", "q")(r.nextInt(3)))
      case 11 => Exprs.notStartsWith("s", Seq("", "p", "q")(r.nextInt(3)))
      case 12 => Exprs.equal("s", sv)
    }
  }

  private def gen(r: Random, depth: Int): Expr =
    if (depth == 0 || r.nextInt(3) == 0) genPred(r)
    else r.nextInt(3) match {
      case 0 => Exprs.and(gen(r, depth - 1), gen(r, depth - 1))
      case 1 => Exprs.or(gen(r, depth - 1), gen(r, depth - 1))
      case 2 => Exprs.not(gen(r, depth - 1)) // bind rewrites to leaves
    }

  test("toColumn and eval select the same rows for engine-produced exprs") {
    val longs: Seq[Any] = Seq(null, 0L, 1L, 2L, 3L, 5L)
    val strings: Seq[Any] = Seq(null, "", "p", "px", "q", "qx")
    val rows = for (a <- longs; s <- strings)
      yield (a.asInstanceOf[java.lang.Long], s.asInstanceOf[String])
    val df = rows.toDF("a", "s")
    val r = new Random(50)
    val exprs = Seq.fill(400)(Exprs.bind(gen(r, 3), schema))
    val idToName = FieldIds.nameToId(schema).map(_.swap)
    // one job: every expression as a boolean column over every row
    val cols = col("a") +: col("s") +:
      exprs.zipWithIndex.map { case (e, i) =>
        // <=> true: Column 3VL null collapses to the filter's "not kept"
        (Exprs.toColumn(e) <=> org.apache.spark.sql.functions.lit(true))
          .as(s"e$i")
      }
    df.select(cols: _*).collect().foreach { row =>
      val vals = Map("a" -> row.get(0), "s" -> row.get(1))
      exprs.zipWithIndex.foreach { case (e, i) =>
        val viaColumn = row.getBoolean(2 + i)
        val viaEval = Exprs.eval(e, id => vals(idToName(id)))
        assert(viaColumn == viaEval,
          s"expr=$e row=$vals column=$viaColumn eval=$viaEval")
      }
    }
  }
}
