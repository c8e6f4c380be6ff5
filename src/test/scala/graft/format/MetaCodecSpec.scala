package graft.format

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Manifest codec (MetaCodec/ManifestAvro): Avro round-trip across the full
  * value-type matrix, gzip round-trip, content-sniffed read compat across
  * mixed codec histories, and rewriteManifests as the migration path. The
  * default is Avro Object Container Files like the reference
  * (core/.../ManifestWriter.java, ManifestListWriter.java) with bounds and
  * partition values in single-value binary form
  * (api/.../types/Conversions.java).
  */
class MetaCodecSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-metacodec-spec/$name"

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("avro manifest round-trips every bound/partition value type") {
    val schema = FieldIds.assignFresh(StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("s", StringType), StructField("d", DateType),
      StructField("ts", TimestampType), StructField("f", FloatType),
      StructField("dbl", DoubleType), StructField("b", BooleanType),
      StructField("dec", DecimalType(10, 2)), StructField("bin", BinaryType))))
    val ids = FieldIds.typeById(schema).keys.toSeq.sorted
    val lower: Map[Int, Any] = Map(
      ids(0) -> 1, ids(1) -> 2L, ids(2) -> "aa", ids(3) -> 19000,
      ids(4) -> 1700000000000000L, ids(5) -> 1.5f, ids(6) -> 2.5d,
      ids(7) -> false, ids(8) -> new java.math.BigDecimal("12.34"),
      ids(9) -> Array[Byte](1, 2, 3))
    val upper: Map[Int, Any] = Map(
      ids(0) -> 9, ids(1) -> 99L, ids(2) -> "zz", ids(3) -> 19999,
      ids(4) -> 1800000000000000L, ids(5) -> 9.5f, ids(6) -> 9.9d,
      ids(7) -> true, ids(8) -> new java.math.BigDecimal("99.99"),
      ids(9) -> Array[Byte](9, 9))
    val partTypes: Map[String, DataType] =
      Map("p_s" -> StringType, "p_i" -> IntegerType, "p_d" -> DateType)
    val entries = Seq(
      ManifestEntry(EntryStatus.Added, 7L, 3L, DataFile(
        path = "data/f1.parquet",
        partition = Map("p_s" -> "x=1/y", "p_i" -> 42, "p_d" -> null),
        recordCount = 100L, fileSizeInBytes = 1234L, schemaId = 1, specId = 2,
        valueCounts = Map(ids(0) -> 100L), nullValueCounts = Map(ids(0) -> 3L),
        lowerBounds = lower, upperBounds = upper,
        equalityIds = Seq(ids(1)), splitOffsets = Seq(4L, 400L),
        fullBoundIds = Seq(ids(2)), fileFormat = FileFormats.Orc)),
      ManifestEntry(EntryStatus.Deleted, 8L, 4L, DataFile(
        path = "data/f2.parquet", content = FileContent.PositionDeletes)),
      ManifestEntry(EntryStatus.Added, 9L, 5L, DataFile(
        path = "data/dv1.puffin", content = FileContent.PositionDeletes,
        recordCount = 7L, fileFormat = FileFormats.Puffin,
        referencedDataFile = Some("/data/f1.parquet"),
        contentOffset = Some(4L), contentSizeInBytes = Some(99L))))

    val bytes = MetaCodec.writeManifest(entries, schema, partTypes, MetaCodec.Avro)
    assert(ManifestAvro.isAvro(bytes))
    val back = MetaCodec.readManifest(bytes, schema, partTypes)
    assert(back.size === 3)
    val (e, o) = (back.head, entries.head)
    assert(e.status === o.status && e.snapshotId === o.snapshotId &&
      e.sequenceNumber === o.sequenceNumber)
    assert(e.file.copy(lowerBounds = Map.empty, upperBounds = Map.empty,
        partition = Map.empty) ===
      o.file.copy(lowerBounds = Map.empty, upperBounds = Map.empty,
        partition = Map.empty))
    assert(e.file.partition("p_s") === "x=1/y")
    assert(e.file.partition("p_i") === 42)
    assert(e.file.partition("p_d") === null)
    // binary bounds need element-wise comparison
    def cmp(a: Map[Int, Any], b: Map[Int, Any]): Unit = {
      assert(a.keySet === b.keySet)
      a.foreach {
        case (k, x: Array[Byte]) =>
          assert(x.toSeq === b(k).asInstanceOf[Array[Byte]].toSeq)
        case (k, x) => assert(x === b(k), s"field $k")
      }
    }
    cmp(e.file.lowerBounds, lower)
    cmp(e.file.upperBounds, upper)
    assert(back(1).file.content === FileContent.PositionDeletes)
    assert(back(1).file.fileFormat === FileFormats.Parquet)
    assert(back(1).file.referencedDataFile === None)
    // deletion-vector address fields (v3) round-trip — avro AND json
    assert(back(2).file === entries(2).file)
    val json = MetaCodec.writeManifest(entries, schema, partTypes, MetaCodec.None_)
    assert(MetaCodec.readManifest(json, schema, partTypes)(2).file === entries(2).file)
  }

  test("avro manifest list round-trips descriptors and summaries") {
    val partTypesOf: Int => Seq[(String, DataType)] = {
      case 0 => Seq("p" -> IntegerType, "q" -> StringType)
      case 1 => Seq("d" -> DateType)
    }
    val mfs = Seq(
      ManifestFile("m1.avro", 100L, 0, FileContent.Data, 5L, 2, 1, 0, 20L, 10L,
        0L, 3L, Seq(FieldSummary(false, 1, 9), FieldSummary(true, "a", "z"))),
      ManifestFile("m2.avro", 50L, 1, FileContent.PositionDeletes, 6L, 1, 0, 1,
        5L, 0L, 2L, 4L, Seq(FieldSummary(true, null, null))))
    val bytes = MetaCodec.writeManifestList(mfs, partTypesOf, MetaCodec.Avro)
    assert(ManifestAvro.isAvro(bytes))
    assert(MetaCodec.readManifestList(bytes, partTypesOf) === mfs)
  }

  test("encode/decode round-trips json codecs; decode sniffs content") {
    val json = """{"entries":[{"path":"x","record-count":1}]}""" * 50
    val gz = MetaCodec.encode(json, MetaCodec.Gzip)
    val plain = MetaCodec.encode(json, MetaCodec.None_)
    assert(MetaCodec.decode(gz) === json)
    assert(MetaCodec.decode(plain) === json)
    assert(gz.length < plain.length / 3, "repetitive JSON must compress well")
    intercept[IllegalArgumentException](MetaCodec.codecFor(Map(
      MetaCodec.Key -> "zstd")))
  }

  test("manifests default to avro and carry the codec in their name") {
    val t = GraftTable.recreate(spark, tmp("default"), rows(0 until 0).schema)
    GraftWrite.append(t, rows(0 until 5).coalesce(1))
    val snap = t.metadata.currentSnapshot.get
    assert(snap.manifestList.endsWith(".avro"))
    val mfs = t.readManifestList(t.metadata, snap)
    assert(mfs.forall(_.path.endsWith(".avro")))
    assert(mfs.forall(mf => ManifestAvro.isAvro(t.ops.io.readBytes(mf.path))))
    // the descriptor length is the stored length
    assert(mfs.forall(mf => mf.length == t.ops.io.readBytes(mf.path).length))
    assert(t.toDF().count() === 5)
  }

  test("mixed codec histories read fine; rewriteManifests migrates") {
    val t = GraftTable.recreate(spark, tmp("migrate"), rows(0 until 0).schema,
      properties = Map(MetaCodec.Key -> MetaCodec.None_))
    GraftWrite.append(t, rows(0 until 4).coalesce(1))
    assert(t.metadata.currentSnapshot.get.manifestList.endsWith(".json"))

    // flip the property mid-history: old JSON + new gzip coexist
    Commits.setProperties(t, Map(MetaCodec.Key -> MetaCodec.Gzip))
    GraftWrite.append(t, rows(4 until 7).coalesce(1))
    // flip again to avro: three codecs in one live tree
    Commits.setProperties(t, Map(MetaCodec.Key -> MetaCodec.Avro))
    GraftWrite.append(t, rows(7 until 9).coalesce(1))
    val mfs = t.readManifestList(t.metadata, t.metadata.currentSnapshot.get)
    assert(mfs.exists(_.path.endsWith(".json")) &&
      mfs.exists(_.path.endsWith(".json.gz")) &&
      mfs.exists(_.path.endsWith(".avro")), "mixed tree expected")
    assert(t.toDF().count() === 9)

    // migration: rewriteManifests re-writes every live manifest under the
    // current codec
    Actions.forTable(t).rewriteManifests()
    val after = t.readManifestList(t.metadata, t.metadata.currentSnapshot.get)
    assert(after.forall(_.path.endsWith(".avro")))
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq ===
      (0L until 9L).toSeq)
  }
}
