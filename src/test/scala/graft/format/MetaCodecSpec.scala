package graft.format

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Manifest byte codec (MetaCodec): gzip round-trip, content-sniffed read
  * compat across mixed codec histories, and rewriteManifests as the
  * migration path — the answer to JSON being several× Avro's bytes on the
  * metadata hot path (reference core/.../ManifestWriter.java writes Avro).
  */
class MetaCodecSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-metacodec-spec/$name"

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("encode/decode round-trips both codecs; decode sniffs content") {
    val json = """{"entries":[{"path":"x","record-count":1}]}""" * 50
    val gz = MetaCodec.encode(json, MetaCodec.Gzip)
    val plain = MetaCodec.encode(json, MetaCodec.None_)
    assert(MetaCodec.decode(gz) === json)
    assert(MetaCodec.decode(plain) === json)
    assert(gz.length < plain.length / 3, "repetitive JSON must compress well")
    intercept[IllegalArgumentException](MetaCodec.codecFor(Map(
      MetaCodec.Key -> "zstd")))
  }

  test("manifests default to gzip and carry the codec in their name") {
    val t = GraftTable.recreate(spark, tmp("default"), rows(0 until 0).schema)
    GraftWrite.append(t, rows(0 until 5).coalesce(1))
    val snap = t.metadata.currentSnapshot.get
    assert(snap.manifestList.endsWith(".json.gz"))
    val mfs = t.readManifestList(t.metadata, snap)
    assert(mfs.forall(_.path.endsWith(".json.gz")))
    // the descriptor length is the stored (compressed) length
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
    val mfs = t.readManifestList(t.metadata, t.metadata.currentSnapshot.get)
    assert(mfs.exists(_.path.endsWith(".json")) &&
      mfs.exists(_.path.endsWith(".json.gz")), "mixed tree expected")
    assert(t.toDF().count() === 7)

    // migration: rewriteManifests re-writes every live manifest under the
    // current codec
    Actions.forTable(t).rewriteManifests()
    val after = t.readManifestList(t.metadata, t.metadata.currentSnapshot.get)
    assert(after.forall(_.path.endsWith(".json.gz")))
    assert(t.toDF().select("id").as[Long].collect().sorted.toSeq ===
      (0L until 7L).toSeq)
  }
}
