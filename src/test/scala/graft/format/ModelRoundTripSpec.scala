package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import scala.util.Random

/** Property round-trips for the metadata JSON codec — the durability
  * surface everything else sits on. Randomized values of every supported
  * bound/partition type (incl. unicode strings, decimals, timestamps,
  * binary-ish edge strings, nulls) and nested id-bearing schemas must
  * survive serialize→parse unchanged. Seeded generators, same style as
  * PruningPropertySpec. */
class ModelRoundTripSpec extends AnyFunSuite {

  private val N = 500

  /** (type, random value) for every supported leaf type. */
  private def randomLeaf(rnd: Random): (DataType, Any) = rnd.nextInt(10) match {
    case 0 => (IntegerType, rnd.nextInt())
    case 1 => (LongType, rnd.nextLong())
    case 2 => (DoubleType, rnd.nextDouble() * 1e12 - 5e11)
    case 3 => (FloatType, rnd.nextFloat() * 1e6f)
    case 4 => (BooleanType, rnd.nextBoolean())
    case 5 =>
      val pool = Seq("", "plain", "héllo wörld", "日本語テキスト",
        "a\"b\\c\nd", "🙂🙃", rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
      (StringType, pool(rnd.nextInt(pool.size)))
    case 6 => (DateType, rnd.nextInt(200001) - 100000)
    case 7 => (TimestampNTZType, rnd.nextLong() % 4102444800000000L)
    case 8 => (DecimalType(14, 4), new java.math.BigDecimal(
      java.math.BigInteger.valueOf(rnd.nextLong() % 999999999L), 4))
    case 9 => // TIME: canonical nanos-of-day
      (TimeType(6), math.abs(rnd.nextLong()) % 86400000000000L)
  }

  test("bound values of every supported type round-trip through manifest JSON") {
    val rnd = new Random(7)
    (0 until N).foreach { _ =>
      val leaves = Seq.fill(1 + rnd.nextInt(6))(randomLeaf(rnd))
      val fields = leaves.zipWithIndex.map { case ((dt, _), i) =>
        FieldIds.withId(StructField(s"c$i", dt), i + 1)
      }
      val schema = StructType(fields)
      val lower = leaves.zipWithIndex.map { case ((_, v), i) => (i + 1) -> v }.toMap
      val file = DataFile(
        path = "/data/f.parquet", partition = Map.empty,
        recordCount = 10L, fileSizeInBytes = 100L, schemaId = 0, specId = 0,
        valueCounts = leaves.indices.map(i => (i + 1) -> 10L).toMap,
        nullValueCounts = leaves.indices.map(i => (i + 1) -> 0L).toMap,
        lowerBounds = lower, upperBounds = lower)
      val json = Model.manifestToJson(
        Seq(ManifestEntry(EntryStatus.Added, 1L, 1L, file)), schema, Map.empty)
      val bf = Model.manifestFromJson(json, schema, Map.empty).head.file
      assert(bf.path == file.path && bf.recordCount == file.recordCount)
      assert(bf.valueCounts == file.valueCounts)
      assert(bf.lowerBounds == file.lowerBounds,
        s"bounds diverged:\n  ${bf.lowerBounds}\n  ${file.lowerBounds}")
      assert(bf.upperBounds == file.upperBounds)
    }
  }

  test("partition tuples of every supported type (and null) round-trip") {
    val rnd = new Random(11)
    (0 until N).foreach { _ =>
      val (dt, v0) = randomLeaf(rnd)
      val v = if (rnd.nextInt(5) == 0) null else v0
      val schema = StructType(Seq(
        FieldIds.withId(StructField("id", LongType), 1),
        FieldIds.withId(StructField("p", dt), 2)))
      val partTypes = Map("p" -> dt)
      val file = DataFile(path = "/data/f.parquet",
        partition = Map("p" -> v), recordCount = 1L, fileSizeInBytes = 1L,
        schemaId = 0, specId = 0)
      val json = Model.manifestToJson(
        Seq(ManifestEntry(EntryStatus.Added, 1L, 1L, file)), schema, partTypes)
      val back = Model.manifestFromJson(json, schema, partTypes).head.file
      assert(back.partition == file.partition,
        s"partition diverged for $dt: ${back.partition} vs ${file.partition}")
    }
  }

  test("nested id-bearing schemas round-trip through metadata JSON") {
    val schema = FieldIds.assignFresh(new StructType()
      .add("id", LongType)
      .add("who", new StructType()
        .add("name", StringType)
        .add("geo", new StructType().add("lat", DoubleType).add("lon", DoubleType)))
      .add("tags", ArrayType(StringType)))
    val meta = TableMetadata(
      formatVersion = 2, tableUuid = "u", location = "/tmp/t",
      lastSequenceNumber = 3L, lastUpdatedMillis = 42L,
      lastColumnId = FieldIds.maxId(schema), currentSchemaId = 0,
      schemas = Map(0 -> schema), defaultSpecId = 0,
      specs = Map(0 -> PartitionSpec.builderFor(schema).identity("id").build(0)),
      properties = Map("k" -> "v"), currentSnapshotId = None,
      snapshots = Nil, snapshotLog = Nil)
    val back = Model.metadataFromJson(Model.metadataToJson(meta))
    assert(back.schemas(0) == schema, "nested schema (with ids) diverged")
    assert(FieldIds.maxId(back.schemas(0)) == FieldIds.maxId(schema))
    assert(back.specs(0) == meta.specs(0))
    assert(back == meta)
  }

  test("Tuples.key and Tuples.equal agree across value kinds (property)") {
    // the content-comparison helpers back every tuple-level map key and
    // equality in the engine: key(a) == key(b) must hold exactly when
    // equal(a, b), and equal keys must hash equal (HashMap contract)
    val rnd = new Random(51)
    val names = Seq("p", "q")
    def value(): Any = rnd.nextInt(6) match {
      case 0 => null
      case 1 => rnd.nextInt(3).toLong
      case 2 => Seq("a", "b")(rnd.nextInt(2))
      case 3 => Array[Byte](rnd.nextInt(2).toByte, rnd.nextInt(2).toByte)
      case 4 => Array.empty[Byte]
      case 5 => new java.math.BigDecimal(rnd.nextInt(3)).setScale(2)
    }
    def tuple(): Map[String, Any] =
      names.take(1 + rnd.nextInt(2)).map(_ -> value()).toMap
    (0 until 2000).foreach { _ =>
      val a = tuple(); val b = if (rnd.nextBoolean()) tuple() else
        // content-equal twin with FRESH array instances
        a.map { case (k, v: Array[Byte]) => k -> v.clone(); case kv => kv }
      val eq = Tuples.equal(a, b)
      assert(eq === (Tuples.key(a) == Tuples.key(b)),
        s"equal/key disagree on $a vs $b")
      if (eq) assert(Tuples.key(a).hashCode === Tuples.key(b).hashCode)
      assert(Tuples.equal(a, a.map { case (k, v: Array[Byte]) => k -> v.clone()
        case kv => kv }), s"content-equal twin must be equal: $a")
    }
  }
}
