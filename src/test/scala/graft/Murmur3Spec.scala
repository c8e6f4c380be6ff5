package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Murmur3

/** Golden vectors from the Iceberg spec, as pinned by the reference's
  * api/src/test/java/org/apache/iceberg/transforms/TestBucketing.java:64-116.
  * These pin bucket-partition placement compatibility. */
class Murmur3Spec extends AnyFunSuite {

  test("spec golden vectors") {
    assert(Murmur3.hashLong(1L) === 1392991556) // hash(true)
    assert(Murmur3.hashInt(34) === 2017239379)
    assert(Murmur3.hashLong(34L) === 2017239379)
    // the reference's test labels these "17.11" but actually hashes 1.0
    // (TestBucketing.java:70-73: new Bucket.BucketFloat(100).hash(1.0F))
    assert(Murmur3.hashFloat(1.0f) === -142385009)
    assert(Murmur3.hashDouble(1.0d) === -142385009)
    assert(Murmur3.hashDecimal(new java.math.BigDecimal("14.20")) === -500754589)
    // date 2017-11-16 = 17486 days since epoch
    assert(Murmur3.hashInt(17486) === -653330422)
    // time 22:31:08 = 81068000000 micros
    assert(Murmur3.hashLong(81068000000L) === -662762989)
    // timestamp 2017-11-16T22:31:08 UTC = 1510871468000000 micros
    assert(Murmur3.hashLong(1510871468000000L) === -2047944441)
    assert(Murmur3.hashString("iceberg") === 1210000089)
    assert(Murmur3.hashUUID(java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")) === 1488055340)
    assert(Murmur3.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("int and long hash agree (bucket join compatibility)") {
    Seq(0, 1, -1, 34, Int.MaxValue, Int.MinValue).foreach { i =>
      assert(Murmur3.hashInt(i) === Murmur3.hashLong(i.toLong))
    }
  }

  test("float and double hash agree") {
    Seq(0f, 1.5f, -17.11f, Float.MaxValue).foreach { f =>
      assert(Murmur3.hashFloat(f) === Murmur3.hashDouble(f.toDouble))
    }
  }
}
