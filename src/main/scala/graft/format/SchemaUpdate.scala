package graft.format

import org.apache.spark.sql.types._

/** Schema evolution — id-based, metadata-only (reference
  * api/.../UpdateSchema.java:31-363, impl core/.../SchemaUpdate.java;
  * promotion rules api/.../types/TypeUtil.java:189 isPromotionAllowed:
  * int→long, float→double, decimal precision widen at same scale).
  *
  * Each commit adds a NEW schema id; existing data files keep their
  * schema-id and are re-mapped on read by field id (TableScan.alignToSchema).
  */
final case class SchemaUpdate(table: GraftTable) {
  private var ops: Seq[StructType => StructType] = Nil
  private var newColumns: Seq[(String, DataType, Boolean, Option[String])] = Nil

  def addColumn(name: String, dt: DataType, nullable: Boolean = true,
      doc: Option[String] = None): SchemaUpdate = {
    newColumns = newColumns :+ ((name, dt, nullable, doc)); this
  }

  def renameColumn(from: String, to: String): SchemaUpdate = {
    ops = ops :+ { st: StructType =>
      require(st.fieldNames.contains(from), s"no column $from")
      require(!st.fieldNames.contains(to), s"column $to exists")
      StructType(st.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    }
    this
  }

  def updateColumnType(name: String, to: DataType): SchemaUpdate = {
    ops = ops :+ { st: StructType =>
      StructType(st.fields.map { f =>
        if (f.name != name) f
        else {
          require(promotionAllowed(f.dataType, to),
            s"cannot promote ${f.dataType} to $to")
          f.copy(dataType = to)
        }
      })
    }
    this
  }

  def makeColumnOptional(name: String): SchemaUpdate = {
    ops = ops :+ { st: StructType =>
      StructType(st.fields.map(f => if (f.name == name) f.copy(nullable = true) else f))
    }
    this
  }

  def deleteColumn(name: String): SchemaUpdate = {
    ops = ops :+ { st: StructType =>
      require(st.fieldNames.contains(name), s"no column $name")
      StructType(st.fields.filterNot(_.name == name))
    }
    this
  }

  def moveFirst(name: String): SchemaUpdate = move(name, st => 0)
  def moveAfter(name: String, after: String): SchemaUpdate =
    move(name, st => st.fieldNames.indexOf(after) + 1)

  private def move(name: String, pos: StructType => Int): SchemaUpdate = {
    ops = ops :+ { st: StructType =>
      val f = st.fields.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
      val without = st.fields.filterNot(_.name == name)
      val i = math.min(pos(StructType(without)), without.length)
      StructType((without.take(i) :+ f) ++ without.drop(i))
    }
    this
  }

  private def promotionAllowed(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d1.scale == d2.scale && d2.precision >= d1.precision
      case _ => false
    }

  def commit(): TableMetadata =
    table.ops.commitTransaction { m =>
      var st = m.schema
      ops.foreach(op => st = op(st))
      var lastId = math.max(m.lastColumnId, FieldIds.maxId(st))
      newColumns.foreach { case (name, dt, nullable, doc) =>
        require(!st.fieldNames.contains(name), s"column $name exists")
        lastId += 1
        val base = StructField(name, dt, nullable)
        val withDoc = doc.map(d => base.copy(metadata =
          new MetadataBuilder().putString("comment", d).build())).getOrElse(base)
        st = StructType(st.fields :+ FieldIds.withId(withDoc, lastId))
      }
      val newSchemaId = m.schemas.keys.max + 1
      m.copy(
        lastColumnId = lastId,
        currentSchemaId = newSchemaId,
        schemas = m.schemas + (newSchemaId -> st),
        lastUpdatedMillis = System.currentTimeMillis())
    }
}
