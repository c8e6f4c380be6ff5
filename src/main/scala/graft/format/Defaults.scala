package graft.format

import org.apache.spark.sql.types.{MetadataBuilder, StructField}

/** Initial column defaults (iceberg v3 `initial-default`): a column added
  * to an existing table may carry a default that READS apply to every row
  * of files written BEFORE the column existed — a metadata-only backfill.
  * Files written after the addition store real values; "file predates the
  * column" is detected exactly like every other evolution here, by the
  * field id being absent from the file's writer schema.
  *
  * The default is stored in the field's metadata (JSON via the Values
  * codec, so it survives the schema round-trip) and restricted to
  * TOP-LEVEL atomic columns — nested adds keep reading null. */
object Defaults {
  val Key = "initial-default"

  def of(f: StructField): Option[Any] =
    if (f.metadata.contains(Key))
      Some(Values.fromJson(Json.parse(f.metadata.getString(Key)).get("v"),
        Types.cleanType(f.dataType)))
    else None

  def withDefault(f: StructField, v: Any): StructField = {
    require(v != null, "an initial default of null is just the absent default")
    val o = Json.obj()
    Values.toJson(o, "v", v, Types.cleanType(f.dataType))
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(Key, Json.write(o)).build())
  }

}
