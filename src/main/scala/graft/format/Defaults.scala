package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField, StructType}

/** Initial column defaults (iceberg v3 `initial-default`): a column added
  * to an existing table may carry a default that READS apply to every row
  * of files written BEFORE the column existed — a metadata-only backfill.
  * Files written after the addition store real values; "file predates the
  * column" is detected exactly like every other evolution here, by the
  * field id being absent from the file's writer schema (at EVERY struct
  * level — nested adds carry defaults too).
  *
  * The default is stored in the field's metadata (JSON via the Values
  * codec, so it survives the schema round-trip) and restricted to ATOMIC
  * leaf types. Struct-nested fields are supported; defaults under arrays
  * and maps are refused (per-element backfill is genuinely ambiguous). */
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
    // coerce like a filter literal (Int → Long, "2024-01-01" → epoch day,
    // LocalTime → nanos, …): callers pass natural Scala literals, the
    // codec wants the canonical domain
    Values.toJson(o, "v",
      Exprs.coerce(v, Types.cleanType(f.dataType)), Types.cleanType(f.dataType))
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(Key, Json.write(o)).build())
  }

  /** Struct-NESTED defaulted fields a file generation misses: for the
    * target field's type tree, every defaulted descendant struct field
    * whose id is absent from `fileIds` as (field-index path from the
    * column's root type, clean leaf type, CATALYST default value). Arrays
    * and maps are not descended (defaults there are refused at add time). */
  def nestedFills(rootType: DataType,
      fileIds: Set[Int]): Seq[(Seq[Int], DataType, Any)] = {
    def walk(dt: DataType, prefix: Seq[Int]): Seq[(Seq[Int], DataType, Any)] =
      dt match {
        case s: StructType => s.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
          val self =
            if (f.metadata.contains(FieldIds.Key) &&
                !fileIds.contains(FieldIds.idOf(f)))
              of(f).map { v =>
                val ct = Types.cleanType(f.dataType)
                (prefix :+ i, ct, Values.toCatalyst(v, ct))
              }.toSeq
            else Nil
          self ++ walk(f.dataType, prefix :+ i)
        }
        case _ => Nil
      }
    walk(rootType, Nil)
  }

  /** Copy a struct value with the field at `path` set to `v`. A null
    * struct anywhere on the path stays null (the default applies to the
    * FIELD, not to absent parent rows). */
  def fillStruct(struct: InternalRow, st: StructType,
      path: Seq[Int], v: Any): InternalRow = {
    if (struct == null) return null
    val out = new GenericInternalRow(st.length)
    var i = 0
    while (i < st.length) {
      out.update(i, if (struct.isNullAt(i)) null else struct.get(i, st(i).dataType))
      i += 1
    }
    path match {
      case Seq(leaf) => out.update(leaf, v)
      case head +: rest =>
        val childType = st(head).dataType.asInstanceOf[StructType]
        if (!struct.isNullAt(head))
          out.update(head,
            fillStruct(struct.getStruct(head, childType.length), childType, rest, v))
      case _ => ()
    }
    out
  }
}
