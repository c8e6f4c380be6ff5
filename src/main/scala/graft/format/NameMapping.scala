package graft.format

import org.apache.spark.sql.types._

/** Fallback name→id mapping for files written WITHOUT field ids (reference
  * core/.../mapping/NameMapping.java:31, applied by readers when a data file
  * carries no ids). Our data files never embed ids — alignment normally
  * resolves through the per-schemaId recorded schema — so the mapping's job
  * here is the IMPORT side of the same problem: assigning STABLE ids to
  * id-less external files so they can join (or re-join) an id'd table, and
  * keeping those assignments across re-imports and later evolution.
  *
  * Stored as the `schema.name-mapping.default` table property (the
  * reference's own property name, core/.../TableProperties.java), as JSON
  * `{"dotted.path": id, ...}` covering every struct level.
  */
final case class NameMapping(byPath: Map[String, Int]) {

  def idFor(path: String): Option[Int] = byPath.get(path)

  /** Assign ids to an id-less schema: mapped paths take their mapped id,
    * unmapped fields get fresh ids above both the mapping's max and
    * `lastId`. Returns the id'd schema. */
  def applyTo(schema: StructType, lastId: Int = 0): StructType = {
    var next = math.max(lastId, byPath.values.maxOption.getOrElse(0))
    def walk(st: StructType, prefix: String): StructType =
      StructType(st.fields.map { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val id = byPath.getOrElse(path, { next += 1; next })
        val dt = f.dataType match {
          case s: StructType => walk(s, path)
          case other => other
        }
        FieldIds.withId(f.copy(dataType = dt), id)
      })
    walk(schema, "")
  }

  def toJson: String = {
    // proper JSON escaping — a column name holding a quote or backslash
    // must survive the property round-trip
    val o = Json.obj()
    byPath.toSeq.sortBy(_._2).foreach { case (p, id) => o.put(p, id) }
    Json.write(o)
  }
}

object NameMapping {
  /** Table property carrying the mapping (reference TableProperties:
    * DEFAULT_NAME_MAPPING = "schema.name-mapping.default"). */
  val PropertyKey = "schema.name-mapping.default"

  /** Derive the mapping from an id-bearing schema (dotted paths, all
    * struct levels) — reference MappingUtil.create. */
  def fromSchema(schema: StructType): NameMapping = {
    val out = Map.newBuilder[String, Int]
    def walk(st: StructType, prefix: String): Unit =
      st.fields.foreach { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        out += path -> FieldIds.idOf(f)
        f.dataType match {
          case s: StructType if FieldIds.structHasIds(s) => walk(s, path)
          case _ => ()
        }
      }
    walk(schema, "")
    NameMapping(out.result())
  }

  def fromJson(json: String): NameMapping =
    NameMapping(Json.fields(Json.parse(json))
      .map { case (k, v) => k -> v.asInt() }.toMap)

  def of(table: GraftTable): Option[NameMapping] =
    table.properties.get(PropertyKey).map(fromJson)
}
