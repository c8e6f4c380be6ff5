package graft.format

import org.apache.spark.sql.types._

/** Field-id schema kernel.
  *
  * The reference resolves columns by integer field id, not name
  * (api/.../Schema.java:116-272; ids are assigned in
  * api/.../types/TypeUtil.java `assignFreshIds`) — that's what makes
  * rename/move metadata-only operations. Spark has no native field ids, so
  * we carry them in `StructField.metadata` under `FieldIds.Key`, exactly the
  * strategy the reference's own Spark bridge uses in reverse
  * (spark/.../SparkSchemaUtil.convert:95-124 materializes ids when going
  * Iceberg→Spark).
  *
  * Top-level fields only carry ids (our tables' data columns); nested types
  * travel as opaque Spark DataTypes. The reference supports nested-field
  * evolution too — out of scope for parity with the test surface.
  */
object FieldIds {
  val Key = "graft.field-id"

  def idOf(f: StructField): Int = f.metadata.getLong(Key).toInt

  def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putLong(Key, id.toLong).build())

  def hasIds(st: StructType): Boolean =
    st.fields.forall(_.metadata.contains(Key))

  /** Assign ids 1..n in field order (reference TypeUtil.assignFreshIds). */
  def assignFresh(st: StructType): StructType =
    StructType(st.fields.zipWithIndex.map { case (f, i) => withId(f, i + 1) })

  def maxId(st: StructType): Int =
    if (st.fields.isEmpty) 0 else st.fields.map(idOf).max

  def findById(st: StructType, id: Int): Option[StructField] =
    st.fields.find(f => idOf(f) == id)

  def idToName(st: StructType): Map[Int, String] =
    st.fields.map(f => idOf(f) -> f.name).toMap

  def nameToId(st: StructType): Map[String, Int] =
    st.fields.map(f => f.name -> idOf(f)).toMap

  def typeById(st: StructType): Map[Int, DataType] =
    st.fields.map(f => idOf(f) -> f.dataType).toMap

  /** Serialize with ids (StructType.json keeps metadata). */
  def toJson(st: StructType): String = st.json
  def fromJson(s: String): StructType =
    DataType.fromJson(s).asInstanceOf[StructType]
}
