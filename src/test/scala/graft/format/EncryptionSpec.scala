package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Trivial XOR manager: enough to prove bytes really flow through the
  * manager on both sides (a missed decrypt produces an unreadable file, a
  * missed encrypt leaves a readable plaintext one). */
final class XorEncryptionManager extends EncryptionManager {
  private val Key: Byte = 0x5A
  override def encrypt(path: String, plaintext: Array[Byte]): Array[Byte] =
    plaintext.map(b => (b ^ Key).toByte)
  override def decrypt(path: String, stored: Array[Byte]): Array[Byte] =
    stored.map(b => (b ^ Key).toByte)
}

/** EncryptionManager seam (reference api/.../encryption/EncryptionManager
  * .java): plaintext default with zero-cost pass-through; a configured
  * manager wraps every DataFileIO read/write. */
class EncryptionSpec extends AnyFunSuite {

  // parquet writers need the ParquetWriteSupport session keys
  private lazy val conf = ParquetIO.writeConf(graft.SparkSpecBase.spark)
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))
  private val idSchema = FieldIds.assignFresh(schema)

  private def tmp(ext: String): String =
    java.nio.file.Files.createTempDirectory("graft-enc").toString + "/f." + ext

  test("property resolution: absent -> plaintext, class name -> instance") {
    assert(EncryptionManagers.forTable(Map.empty) eq PlaintextEncryptionManager)
    val em = EncryptionManagers.forTable(Map(
      EncryptionManagers.ImplKey -> classOf[XorEncryptionManager].getName))
    assert(em.isInstanceOf[XorEncryptionManager])
    assert(!em.isPlaintext)
  }

  test("xor manager roundtrips through every format; stored bytes differ") {
    val em = new XorEncryptionManager
    for (fmt <- FileFormats.All) {
      val path = tmp(fmt)
      val w = DataFileIO.openWriter(path, fmt, schema, idSchema, conf, em = em)
      (0 until 10).foreach { i =>
        val r = new GenericInternalRow(2)
        r.update(0, i.toLong); r.update(1, UTF8String.fromString(s"v$i"))
        w.write(r)
      }
      val fm = w.finish()
      assert(fm.recordCount === 10, fmt)
      val stored = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      assert(fm.fileSize === stored.length, fmt)
      // the stored form is NOT a readable file of the format
      intercept[Exception](
        DataFileIO.readAll(path, fmt, schema, conf) { _ => () })
      // …but reads fine back through the manager
      val got = collection.mutable.ArrayBuffer[(Long, String)]()
      DataFileIO.readAll(path, fmt, schema, conf, em) { r =>
        got += ((r.getLong(0), r.getUTF8String(1).toString))
      }
      assert(got.toSeq === (0 until 10).map(i => (i.toLong, s"v$i")), fmt)
    }
  }

  test("abort cleans the staging file and never lands stored bytes") {
    val em = new XorEncryptionManager
    val path = tmp("parquet")
    val w = DataFileIO.openWriter(path, FileFormats.Parquet, schema, idSchema,
      conf, em = em)
    val r = new GenericInternalRow(2)
    r.update(0, 1L); r.update(1, UTF8String.fromString("x"))
    w.write(r)
    w.abort()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
  }
}
