package graft.connector

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** SQL-surface wiring for ViewCatalog views. Spark 4.1 ships the
  * ViewCatalog API but no analyzer support — ResolveSessionCatalog throws
  * MISSING_CATALOG_ABILITY the moment a view DDL's identifier resolves to
  * a non-session catalog. Like the Iceberg Spark extensions (reference
  * iceberg spark/.../extensions: RewriteViewCommands + ResolveViews), we
  * take the plan BEFORE that can happen:
  *
  *  - DDL (CREATE/DROP/SHOW/ALTER VIEW) is rewritten at PARSE time
  *    ([[GraftViewParser]]): deterministic, no analyzer-ordering race.
  *  - Reads resolve via an injected resolution rule
  *    ([[ResolveGraftViews]]): an UnresolvedRelation naming a stored view
  *    expands to its parsed SQL with every table reference re-qualified
  *    against the view's defining catalog.namespace, so the view means the
  *    same thing regardless of the reader's context.
  */
object GraftViewRules {

  /** Resolve name parts to (view catalog, identifier) when they land in a
    * ViewCatalog. The session catalog is never a ViewCatalog, so v1 temp /
    * Hive views keep their built-in path untouched. */
  def viewCatalogFor(spark: SparkSession, nameParts: Seq[String])
      : Option[(ViewCatalog, String, Identifier)] = {
    if (nameParts.isEmpty) return None
    val cm = spark.sessionState.catalogManager
    val (cat, catName, rest) =
      (try Some(cm.catalog(nameParts.head))
       catch { case _: Exception => None }) match {
        case Some(c) if nameParts.length > 1 =>
          (c, nameParts.head, nameParts.tail)
        // Spark's CatalogAndIdentifier only applies the current namespace
        // to SINGLE-part names; `db.v` under USE cat.ns must resolve to
        // namespace [db], not [ns, db]
        case _ if nameParts.length == 1 =>
          (cm.currentCatalog, cm.currentCatalog.name,
            cm.currentNamespace.toSeq ++ nameParts)
        case _ => (cm.currentCatalog, cm.currentCatalog.name, nameParts)
      }
    cat match {
      case vc: ViewCatalog if rest.nonEmpty =>
        Some((vc, catName, Identifier.of(rest.init.toArray, rest.last)))
      case _ => None
    }
  }

  private def isTempView(spark: SparkSession, parts: Seq[String]): Boolean =
    try spark.sessionState.catalog.isTempView(parts)
    catch { case scala.util.control.NonFatal(_) => false }

  /** Resolve name parts to (view catalog, identifier), refusing session
    * temp views — a bare `DROP VIEW tv` under a Graft current catalog must
    * still hit the temp view, never a stored one of the same name. */
  private def storedViewTarget(spark: SparkSession, parts: Seq[String])
      : Option[(ViewCatalog, String, Identifier)] =
    if (isTempView(spark, parts)) None else viewCatalogFor(spark, parts)

  /** Parse-time DDL rewrite (see class doc). */
  def rewriteDdl(spark: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, originalText, _, allowExisting, replace, _) =>
      viewCatalogFor(spark, parts) match {
        case Some((vc, _, ident)) =>
          val sql = originalText.getOrElse(throw new IllegalStateException(
            "CREATE VIEW without original SQL text"))
          CreateGraftView(vc, ident, sql, cols, comment, props.toMap,
            allowExisting, replace)
        case None => c
      }
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      storedViewTarget(spark, parts) match {
        case Some((vc, _, ident)) => DropGraftView(vc, ident, ifExists)
        case None => d
      }
    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, out) =>
      // resolve the namespace the way identifiers resolve: a leading
      // catalog name wins, otherwise the current catalog owns the parts
      val cm = spark.sessionState.catalogManager
      val (cat, ns) =
        (if (parts.nonEmpty)
          try Some(cm.catalog(parts.head)) catch { case _: Exception => None }
        else None) match {
          case Some(c) => (c, parts.tail)
          case None => (cm.currentCatalog,
            if (parts.nonEmpty) parts else cm.currentNamespace.toSeq)
        }
      cat match {
        case vc: ViewCatalog => ShowGraftViews(vc, ns.toArray, pattern, out)
        case _ => s
      }
    case a @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
      storedViewTarget(spark, parts) match {
        case Some((vc, _, ident)) =>
          AlterGraftView(vc, ident,
            props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) })
        case None => a
      }
    case a @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _) =>
      storedViewTarget(spark, parts) match {
        case Some((vc, _, ident)) =>
          AlterGraftView(vc, ident, keys.map(ViewChange.removeProperty))
        case None => a
      }
    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _) =>
      storedViewTarget(spark, parts) match {
        // only claim a view that EXISTS: ALTER VIEW on a missing name must
        // not silently create it — leave it for Spark's (failing) resolution
        case Some((vc, _, ident)) if vc.viewExists(ident) =>
          val props = vc.loadView(ident).properties().asScala.toMap
            .view.filterKeys(!ViewCatalog.RESERVED_PROPERTIES.contains(_)).toMap
          CreateGraftView(vc, ident, originalText, Nil, None, props,
            allowExisting = false, replace = true)
        case _ => a
      }
    case d @ DescribeRelation(UnresolvedTableOrView(parts, _, _), spec, ext, out)
        if spec.isEmpty =>
      storedViewTarget(spark, parts) match {
        case Some((vc, _, ident)) if vc.viewExists(ident) =>
          DescribeGraftView(vc, ident, ext, out)
        case _ => d
      }
    case r @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true) =>
      storedViewTarget(spark, parts) match {
        case Some((vc, _, ident)) if vc.viewExists(ident) =>
          viewCatalogFor(spark, newName) match {
            case Some((vc2, _, to)) if vc2 == vc => RenameGraftView(vc, ident, to)
            case _ => throw new IllegalArgumentException(
              s"cannot rename view across catalogs: ${newName.mkString(".")}")
          }
        case _ => r
      }
    case other => other
  }
}

/** Delegating parser that applies the view-DDL rewrite to every parsed
  * plan (single-statement entry points). */
final class GraftViewParser(spark: () => SparkSession, delegate: ParserInterface)
  extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViewRules.rewriteDdl(spark(), delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Expand reads of stored views (reference iceberg ResolveViews). Runs in
  * the resolution batch: relations the built-in rules could not bind are
  * still UnresolvedRelation here, so claiming them is race-free. */
final case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private val maxDepth = 16

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a write would otherwise EXPAND its target view bottom-up and fail
    // with an unrelated error; refuse it by name first
    plan.foreach {
      case i: InsertIntoStatement => i.table match {
        case u: UnresolvedRelation if !isTempView(u.multipartIdentifier) &&
            GraftViewRules.viewCatalogFor(spark, u.multipartIdentifier)
              .exists { case (vc, _, id) => vc.viewExists(id) } =>
          throw new UnsupportedOperationException(
            s"cannot write to a view: ${u.multipartIdentifier.mkString(".")}")
        case _ => ()
      }
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        expand(u, 0).getOrElse(u)
    }
  }

  private def isTempView(parts: Seq[String]): Boolean =
    spark.sessionState.catalog.isTempView(parts)

  private def expand(u: UnresolvedRelation, depth: Int): Option[LogicalPlan] = {
    if (depth > maxDepth) throw new IllegalStateException(
      s"view nesting exceeds $maxDepth levels (cycle?): ${u.multipartIdentifier.mkString(".")}")
    if (isTempView(u.multipartIdentifier)) return None
    GraftViewRules.viewCatalogFor(spark, u.multipartIdentifier).flatMap {
      case (vc, catName, ident) if vc.viewExists(ident) =>
        val v = vc.loadView(ident)
        val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
        val cteNames = (parsed +: parsed.subqueriesAll).flatMap(_.collect {
          case w: UnresolvedWith => w.cteRelations.map(_._1)
        }.flatten).toSet
        // re-qualify table references against the DEFINING context so the
        // view is stable under the reader's USE catalog/namespace — and
        // under the reader's temp views: only CTE names defined inside the
        // view body are exempt (reference ResolveViews qualifies
        // unconditionally; CREATE VIEW rejects temp-view refs up front).
        // *WithSubqueries: references inside IN/EXISTS/scalar subquery
        // expressions must requalify too
        val qualified = parsed.transformUpWithSubqueries {
          case r: UnresolvedRelation if r.multipartIdentifier.length < 3 &&
              !(r.multipartIdentifier.length == 1 &&
                cteNames.contains(r.multipartIdentifier.head)) =>
            val full =
              if (r.multipartIdentifier.length == 1)
                v.currentCatalog +: (v.currentNamespace.toSeq ++ r.multipartIdentifier)
              else v.currentCatalog +: r.multipartIdentifier
            r.copy(multipartIdentifier = full)
        }
        // nested stored views expand recursively with a depth guard
        val resolved = qualified.transformUpWithSubqueries {
          case inner: UnresolvedRelation if !inner.isStreaming =>
            expand(inner, depth + 1).getOrElse(inner)
        }
        val aliased =
          if (v.columnAliases() != null && v.columnAliases().nonEmpty &&
              v.columnAliases().length == v.queryColumnNames().length) {
            Project(v.queryColumnNames().zip(v.columnAliases()).toIndexedSeq
              .map { case (q, a) =>
                Alias(UnresolvedAttribute.quoted(q), a)()
              }, resolved)
          } else resolved
        Some(SubqueryAlias(Seq(catName) ++ ident.namespace() :+ ident.name(),
          aliased))
      case _ => None
    }
  }
}

// ---- eagerly-executed commands (planned by the built-in command
// strategy; no custom SparkStrategy needed) ------------------------------

final case class CreateGraftView(catalog: ViewCatalog, ident: Identifier,
    sql: String, userCols: Seq[(String, Option[String])],
    comment: Option[String], props: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (allowExisting && catalog.viewExists(ident)) return Nil
    // a stored view must mean the same thing for every reader, so its body
    // may not capture session temp views (Spark rejects this for v1
    // persistent views too; reference ResolveViews qualifies all refs)
    locally {
      val parsed = spark.sessionState.sqlParser.parsePlan(sql)
      // subqueriesAll: IN/EXISTS/scalar subquery expressions hold nested
      // plans that plain foreach/collect never visit
      val trees = parsed +: parsed.subqueriesAll
      val cteNames = trees.flatMap(_.collect {
        case w: UnresolvedWith => w.cteRelations.map(_._1)
      }.flatten).toSet
      trees.foreach(_.foreach {
        case r: UnresolvedRelation
            if !(r.multipartIdentifier.length == 1 &&
                 cteNames.contains(r.multipartIdentifier.head)) &&
               (try spark.sessionState.catalog.isTempView(r.multipartIdentifier)
                catch { case scala.util.control.NonFatal(_) => false }) =>
          throw new UnsupportedOperationException(
            s"cannot create stored view ${ident.name()}: it references " +
            s"temporary view ${r.multipartIdentifier.mkString(".")}")
        case _ => ()
      })
    }
    val analyzed = spark.sql(sql).queryExecution.analyzed
    val queryCols = analyzed.schema.fieldNames
    if (userCols.nonEmpty && userCols.length != queryCols.length)
      throw new IllegalArgumentException(
        s"view column list has ${userCols.length} names but the query " +
        s"produces ${queryCols.length} columns")
    val schema =
      if (userCols.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(userCols).map {
        case (f, (n, _)) => f.copy(name = n)
      })
    val cm = spark.sessionState.catalogManager
    val allProps = props ++
      comment.map(c => ViewCatalog.PROP_COMMENT -> c).toMap
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, queryCols,
      userCols.map(_._1).toArray, userCols.map(_._2.orNull).toArray,
      allProps.asJava)
    if (replace) catalog.replaceView(info, true)
    else catalog.createView(info)
    Nil
  }
}

final case class DropGraftView(catalog: ViewCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Nil
  }
}

final case class ShowGraftViews(catalog: ViewCatalog, namespace: Array[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // SHOW VIEWS patterns are literals plus '*' wildcards and '|'
    // alternation (SparkSQL StringUtils.filterPattern semantics) — quote
    // every literal segment so regex metacharacters ('.', '+', parens)
    // match themselves
    val re = pattern.map { p =>
      val regex = p.split("\\|", -1).map(_.split("\\*", -1)
        .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
        .mkString(".*")).mkString("|")
      java.util.regex.Pattern.compile(regex,
        java.util.regex.Pattern.CASE_INSENSITIVE)
    }
    catalog.listViews(namespace.toIndexedSeq: _*).toSeq
      .filter(i => re.forall(_.matcher(i.name()).matches()))
      .map(i => Row(i.namespace().mkString("."), i.name(), false))
  }
}

final case class AlterGraftView(catalog: ViewCatalog, ident: Identifier,
    changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Nil
  }
}

final case class RenameGraftView(catalog: ViewCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Nil
  }
}

final case class DescribeGraftView(catalog: ViewCatalog, ident: Identifier,
    isExtended: Boolean, override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident)
    val cols = v.schema().fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Name", (ident.namespace() :+ ident.name()).mkString("."), ""),
      Row("View Text", v.query(), ""),
      Row("View Catalog and Namespace",
        (v.currentCatalog() +: v.currentNamespace()).mkString("."), ""))
  }
}
