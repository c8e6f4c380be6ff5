package graft.util

import java.nio.charset.StandardCharsets

/**
 * Murmur3 x86 32-bit, seed 0 — byte-compatible with Guava's
 * `Hashing.murmur3_32()` as used by the reference's bucket transform
 * (reference: api/src/main/java/org/apache/iceberg/transforms/Bucket.java:43).
 *
 * Type layouts follow the Iceberg spec (reference Bucket.java:157-272):
 *  - int/long/date/time/timestamp → 8 little-endian bytes of the long value
 *  - float/double → 8 LE bytes of `doubleToLongBits(double)`
 *  - string → UTF-8 bytes
 *  - decimal → minimal big-endian two's-complement of the unscaled value
 *  - uuid → 16 big-endian bytes
 *
 * Golden vectors pinned in Murmur3Spec (from the reference's
 * api/src/test/java/org/apache/iceberg/transforms/TestBucketing.java:64-116).
 */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte]): Int = hashBytes(data, 0, data.length, 0)

  def hashBytes(data: Array[Byte], offset: Int, len: Int, seed: Int): Int = {
    var h1 = seed
    val fourByteEnd = offset + (len & ~3)
    var i = offset
    while (i < fourByteEnd) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 ^= (data(fourByteEnd + 2) & 0xff) << 16
        k1 ^= (data(fourByteEnd + 1) & 0xff) << 8
        k1 ^= data(fourByteEnd) & 0xff
      case 2 =>
        k1 ^= (data(fourByteEnd + 1) & 0xff) << 8
        k1 ^= data(fourByteEnd) & 0xff
      case 1 =>
        k1 ^= data(fourByteEnd) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    fmix(h1, len)
  }

  private def fmix(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Iceberg bucket-hash of a long: murmur3_32 of its 8 LE bytes. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    hashBytes(b)
  }

  def hashInt(v: Int): Int = hashLong(v.toLong)

  def hashDouble(v: Double): Int = hashLong(java.lang.Double.doubleToLongBits(v))

  def hashFloat(v: Float): Int = hashDouble(v.toDouble)

  def hashString(s: String): Int = hashBytes(s.getBytes(StandardCharsets.UTF_8))

  def hashDecimal(d: java.math.BigDecimal): Int = hashBytes(d.unscaledValue.toByteArray)

  def hashUUID(u: java.util.UUID): Int = {
    val buf = java.nio.ByteBuffer.allocate(16)
    buf.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    hashBytes(buf.array)
  }

  /** Seeded variant for minhash permutations / simhash halves. */
  def hashStringSeed(s: String, seed: Int): Int = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    hashBytes(b, 0, b.length, seed)
  }
}
