package graft.connector

import com.fasterxml.jackson.databind.JsonNode
import graft.format.Json
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** SQL views for GraftCatalog (Spark 4 ViewCatalog; the Iceberg view spec
  * is the reference surface — a view is named SQL plus the context needed
  * to re-resolve it: defining catalog/namespace, declared schema, column
  * aliases/comments, properties).
  *
  * Storage: one JSON file per view at `warehouse/ns/<name>.view.json` —
  * deliberately NOT a directory, so a view can never be mistaken for a
  * table by the table paths (tables are directories with `metadata/`).
  * Writes go through a temp-file + atomic move, so a reader never sees a
  * half-written view. */
trait GraftViews extends ViewCatalog { self =>

  // supplied by GraftCatalog
  protected def viewWarehouse: String
  /** This catalog's registered name — RENAME targets may arrive
    * catalog-qualified, mirroring GraftCatalog.renameTable. */
  def name(): String

  private def nsDir(ns: Array[String]) =
    Paths.get((viewWarehouse +: ns.toSeq).mkString("/"))
  private def viewFile(ident: Identifier) =
    nsDir(ident.namespace()).resolve(ident.name() + ".view.json")

  override def listViews(namespace: String*): Array[Identifier] = {
    val dir = nsDir(namespace.toArray)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace.toArray)
    val s = Files.list(dir) // close the stream: it holds an open dir fd
    val names =
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".view.json"))
        .map(_.getFileName.toString.stripSuffix(".view.json")).toSeq
      finally s.close()
    names.map(Identifier.of(namespace.toArray, _)).toArray.sortBy(_.name())
  }

  override def viewExists(ident: Identifier): Boolean =
    Files.exists(viewFile(ident))

  override def loadView(ident: Identifier): View = {
    val f = viewFile(ident)
    if (!Files.exists(f)) throw new NoSuchViewException(ident)
    fromJson(ident, Files.readString(f))
  }

  override def createView(info: ViewInfo): View = {
    val ident = info.ident()
    if (!Files.isDirectory(nsDir(ident.namespace())))
      throw new NoSuchNamespaceException(ident.namespace())
    if (viewExists(ident)) throw new ViewAlreadyExistsException(ident)
    val v = StoredView(ident.name(), info.sql(), info.currentCatalog(),
      info.currentNamespace(), info.schema(), info.queryColumnNames(),
      info.columnAliases(), info.columnComments(),
      Option(info.properties()).map(_.asScala.toMap).getOrElse(Map.empty))
    write(ident, v)
    v
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident()
    if (!viewExists(ident) && !orCreate) throw new NoSuchViewException(ident)
    if (!Files.isDirectory(nsDir(ident.namespace())))
      throw new NoSuchNamespaceException(ident.namespace())
    val v = StoredView(ident.name(), info.sql(), info.currentCatalog(),
      info.currentNamespace(), info.schema(), info.queryColumnNames(),
      info.columnAliases(), info.columnComments(),
      Option(info.properties()).map(_.asScala.toMap).getOrElse(Map.empty))
    write(ident, v)
    v
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val base = loadView(ident).asInstanceOf[StoredView]
    val updated = changes.foldLeft(base) { (v, c) =>
      c match {
        case s: ViewChange.SetProperty =>
          v.copy(props = v.props + (s.property() -> s.value()))
        case r: ViewChange.RemoveProperty =>
          v.copy(props = v.props - r.property())
        case other => throw new UnsupportedOperationException(
          s"view change: $other")
      }
    }
    write(ident, updated)
    updated
  }

  override def dropView(ident: Identifier): Boolean =
    Files.deleteIfExists(viewFile(ident))

  override def renameView(from: Identifier, to0: Identifier): Unit = {
    // RENAME TO targets may arrive catalog-qualified (same contract as
    // GraftCatalog.renameTable): strip our own leading catalog name, or
    // `ALTER VIEW c.db.v RENAME TO c.db.v2` resolves into the bogus
    // namespace [c, db]
    val to =
      if (to0.namespace().headOption.contains(name()))
        Identifier.of(to0.namespace().drop(1), to0.name())
      else to0
    if (!viewExists(from)) throw new NoSuchViewException(from)
    if (viewExists(to)) throw new ViewAlreadyExistsException(to)
    if (!Files.isDirectory(nsDir(to.namespace())))
      throw new NoSuchNamespaceException(to.namespace())
    val renamed = loadView(from).asInstanceOf[StoredView].copy(vname = to.name())
    write(to, renamed)
    Files.delete(viewFile(from))
  }

  private def write(ident: Identifier, v: StoredView): Unit = {
    val f = viewFile(ident)
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp-" +
      java.util.UUID.randomUUID())
    Files.writeString(tmp, toJson(v))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- model + JSON ----------------------------------------------------

  private[connector] final case class StoredView(vname: String, sql: String,
      catalog: String, namespace: Array[String], viewSchema: StructType,
      queryCols: Array[String], aliases: Array[String],
      comments: Array[String], props: Map[String, String]) extends View {
    override def name(): String = vname
    override def query(): String = sql
    override def currentCatalog(): String = catalog
    override def currentNamespace(): Array[String] = namespace
    override def schema(): StructType = viewSchema
    override def queryColumnNames(): Array[String] = queryCols
    override def columnAliases(): Array[String] = aliases
    override def columnComments(): Array[String] = comments
    override def properties(): java.util.Map[String, String] = props.asJava
  }

  private def toJson(v: StoredView): String = {
    val o = Json.obj()
    o.put("name", v.vname)
    o.put("sql", v.sql)
    o.put("current-catalog", v.catalog)
    val ns = o.putArray("current-namespace")
    v.namespace.foreach(ns.add)
    o.put("schema", v.viewSchema.json)
    def strArr(field: String, vals: Array[String]): Unit = {
      val a = o.putArray(field)
      Option(vals).getOrElse(Array.empty).foreach {
        case null => a.addNull()
        case s => a.add(s)
      }
    }
    strArr("query-column-names", v.queryCols)
    strArr("column-aliases", v.aliases)
    strArr("column-comments", v.comments)
    val p = o.putObject("properties")
    v.props.toSeq.sortBy(_._1).foreach { case (k, x) => p.put(k, x) }
    Json.pretty(o)
  }

  private def fromJson(ident: Identifier, s: String): StoredView = {
    val n = Json.parse(s)
    def strArr(field: String): Array[String] =
      Option(n.get(field)).filterNot(_.isNull)
        .map(_.elements().asScala.map(e =>
          if (e.isNull) null else e.asText()).toArray)
        .getOrElse(Array.empty)
    StoredView(
      vname = n.get("name").asText(),
      sql = n.get("sql").asText(),
      catalog = n.get("current-catalog").asText(),
      namespace = strArr("current-namespace"),
      viewSchema = DataType.fromJson(n.get("schema").asText())
        .asInstanceOf[StructType],
      queryCols = strArr("query-column-names"),
      aliases = strArr("column-aliases"),
      comments = strArr("column-comments"),
      props = Option(n.get("properties")).filterNot(_.isNull)
        .map(p => Json.fields(p).map { case (k, v) => k -> v.asText() }.toMap)
        .getOrElse(Map.empty))
  }
}
