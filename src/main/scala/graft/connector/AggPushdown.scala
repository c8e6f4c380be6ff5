package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => XExpr, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.types._
import graft.format._

/** Metadata-only aggregate pushdown: COUNT(*) / COUNT(col) / MIN / MAX
  * answered entirely from manifest file metrics — zero data-file I/O and
  * zero Spark jobs, because the result surfaces as a `LocalScan` that
  * Catalyst folds into a LocalRelation (the reference's
  * spark3/.../SparkScanBuilder.java pushAggregation → SparkLocalScan is the
  * same design; at 100 TB this turns a full-table `SELECT count(*)` into a
  * driver-side manifest walk it has already done for planning).
  *
  * Every refusal below exists to make a wrong-but-fast answer impossible;
  * refusing is always safe because Spark falls back to the ordinary scan:
  *  - live delete files: file metrics still count deleted rows
  *  - GROUP BY, DISTINCT, non-top-level column references
  *  - MIN/MAX on float/double: the model has no NaN counts, and parquet
  *    stats drop NaNs (NaN sorts above +Inf in Spark) — the reference
  *    refuses for the same reason
  *  - MIN/MAX on string/binary unless the column's metrics mode is `full`:
  *    truncate(N) bounds are range-safe but not value-exact
  *  - any file whose metrics lack the needed count/bound — unless the
  *    file's writer schema predates the column, in which case its rows are
  *    all-null for it and contribute nothing to COUNT(col)/MIN/MAX
  */
object AggPushdown {

  final case class Pushed(schema: StructType, row: InternalRow, funcs: String)

  def tryPush(table: GraftTable, plan: ScanPlan, agg: Aggregation): Option[Pushed] = {
    if (agg.groupByExpressions.nonEmpty) return None
    if (plan.deleteFiles.nonEmpty) return None
    val m = table.metadata
    val schema = m.schema
    val nameToId = FieldIds.nameToId(schema)
    val modes = Metrics.modesFor(schema, m.properties)

    def colOf(e: XExpr): Option[(Int, StructField)] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        for {
          id <- nameToId.get(nr.fieldNames()(0))
          f <- FieldIds.findById(schema, id)
        } yield (id, f)
      case _ => None
    }

    // a file written before the column was added holds only nulls for it
    def fileHasColumn(file: DataFile, id: Int): Boolean =
      FieldIds.findById(m.schemas.getOrElse(file.schemaId, schema), id).isDefined

    def countStar: Option[(Any, DataType)] =
      Some((plan.tasks.map(_.file.recordCount).sum, LongType))

    // value-counts include nulls (parquet chunk value count), so non-null
    // count = values - nulls; both must be present for every file that
    // physically carries the column
    def countCol(id: Int): Option[(Any, DataType)] = {
      var total = 0L
      plan.tasks.foreach { t =>
        if (fileHasColumn(t.file, id)) {
          (t.file.valueCounts.get(id), t.file.nullValueCounts.get(id)) match {
            case (Some(v), Some(n)) => total += v - n
            case _ => return None
          }
        }
      }
      Some((total, LongType))
    }

    def minMaxSafe(id: Int, dt: DataType): Boolean = dt match {
      case FloatType | DoubleType => false
      case StringType | BinaryType => modes.get(id).contains(Metrics.FullMode)
      case IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType | BooleanType | _: DecimalType => true
      case _ => false
    }

    def bound(id: Int, fld: StructField, lower: Boolean): Option[(Any, DataType)] = {
      val dt = Types.cleanType(fld.dataType)
      if (!minMaxSafe(id, dt)) return None
      val ord = Exprs.ordering(dt)
      var acc: Any = null
      plan.tasks.foreach { t =>
        val f = t.file
        if (fileHasColumn(f, id)) {
          val allNull = (f.valueCounts.get(id), f.nullValueCounts.get(id)) match {
            case (Some(v), Some(n)) => v == n
            case _ => false
          }
          if (!allNull) {
            (if (lower) f.lowerBounds else f.upperBounds).get(id) match {
              case Some(v) =>
                if (acc == null || (lower && ord.lt(v, acc)) ||
                    (!lower && ord.gt(v, acc))) acc = v
              case None => return None
            }
          }
        }
      }
      Some((acc, dt))
    }

    val vals: Seq[Option[(Any, DataType)]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => countStar
      case c: Count if !c.isDistinct =>
        colOf(c.column).flatMap { case (id, _) => countCol(id) }
      case mn: Min =>
        colOf(mn.column).flatMap { case (id, f) => bound(id, f, lower = true) }
      case mx: Max =>
        colOf(mx.column).flatMap { case (id, f) => bound(id, f, lower = false) }
      case _ => None
    }
    if (vals.exists(_.isEmpty)) return None
    val resolved = vals.map(_.get)

    val cells = resolved.map {
      // canonical decimals must carry the column's exact scale for the
      // unsafe row layout Spark reads them back through
      case (bd: java.math.BigDecimal, dt: DecimalType) =>
        try Values.toCatalyst(bd.setScale(dt.scale), dt)
        catch { case _: ArithmeticException => return None }
      case (v, dt) => Values.toCatalyst(v, dt)
    }
    val fields = resolved.zipWithIndex.map { case ((_, dt), i) =>
      StructField(s"agg_$i", dt, nullable = true)
    }
    val names = agg.aggregateExpressions.toSeq.map(_.toString).mkString(", ")
    Some(Pushed(StructType(fields), new GenericInternalRow(cells.toArray), names))
  }
}
