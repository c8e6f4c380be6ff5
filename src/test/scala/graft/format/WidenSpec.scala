package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import scala.util.Random

/** Type-promotion width tolerance in Values (reference
  * api/.../types/Conversions.java — fromByteBuffer reads 4-byte bounds
  * under an 8-byte type): bounds/partition values serialized BEFORE an
  * int→long / float→double promotion must decode, re-encode, and compare
  * correctly under the promoted type. Randomized over the full value
  * ranges; seeds fixed for reproducibility. */
class WidenSpec extends AnyFunSuite {

  private val rnd = new Random(41)

  test("4-byte pre-promotion bytes decode under the promoted 8-byte type") {
    (0 until 500).foreach { _ =>
      val i = rnd.nextInt()
      // staged as int, read as long — the promotion shape
      assert(Values.fromBytes(Values.toBytes(i, IntegerType), LongType)
        === i.toLong)
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN)
        assert(Values.fromBytes(Values.toBytes(f, FloatType), DoubleType)
          === f.toDouble)
    }
  }

  test("stale narrow runtime values re-encode at the promoted width") {
    (0 until 500).foreach { _ =>
      val i = rnd.nextInt()
      // a pre-promotion in-memory descriptor re-encoded under the new
      // type (manifest merge / rewrite) must emit 8 bytes, not 4
      val b = Values.toBytes(Int.box(i), LongType)
      assert(b.length === 8 && Values.fromBytes(b, LongType) === i.toLong)
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN) {
        val d = Values.toBytes(Float.box(f), DoubleType)
        assert(d.length === 8 && Values.fromBytes(d, DoubleType) === f.toDouble)
      }
    }
  }

  test("widen preserves ordering across mixed-width generations") {
    val longOrd = Exprs.ordering(LongType)
    (0 until 500).foreach { _ =>
      val narrow = rnd.nextInt()
      val wide = rnd.nextLong()
      val viaBytes = Values.fromBytes(Values.toBytes(narrow, IntegerType), LongType)
      assert(longOrd.compare(viaBytes, wide).sign
        === narrow.toLong.compare(wide).sign)
      assert(longOrd.compare(Values.widen(Int.box(narrow), LongType), wide).sign
        === narrow.toLong.compare(wide).sign)
    }
    val dblOrd = Exprs.ordering(DoubleType)
    (0 until 500).foreach { _ =>
      val f = rnd.nextFloat() * 2e9f - 1e9f
      val d = rnd.nextDouble() * 2e9 - 1e9
      assert(dblOrd.compare(Values.widen(Float.box(f), DoubleType), d).sign
        === f.toDouble.compare(d).sign)
    }
  }

  test("widen is identity off the promotion axes") {
    assert(Values.widen("s", StringType) === "s")
    assert(Values.widen(Long.box(7L), LongType) === 7L)
    assert(Values.widen(Double.box(1.5), DoubleType) === 1.5)
    assert(Values.widen(Int.box(3), IntegerType) === 3)
    assert(Values.widen(null, LongType) === null)
  }
}
