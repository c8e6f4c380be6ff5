package graft.format

import graft.SparkSpec
import scala.util.Random

/** Order-preservation of the z-order byte encodings (the property the whole
  * scheme rests on: value order == unsigned lexicographic byte order) and
  * the interleave layout. Seeded-random property style, like
  * PruningPropertySpec. */
class ZOrderSpec extends SparkSpec {

  private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  test("long encoding preserves order (including sign boundary)") {
    val r = new Random(91)
    val edge = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val vals = edge ++ Seq.fill(500)(r.nextLong())
    for (a <- vals; b <- Seq.fill(5)(vals(r.nextInt(vals.size)))) {
      val (ea, eb) = (ZOrder.encode(a), ZOrder.encode(b))
      assert(((a < b) == unsignedLt(ea, eb)) || a == b,
        s"order broken for $a vs $b")
    }
  }

  test("double encoding preserves order across signs and magnitudes") {
    val r = new Random(92)
    val edge = Seq(0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      1e-300, -1e-300, Double.MaxValue, Double.MinValue, -1.5, 1.5)
    val vals = edge ++ Seq.fill(500)((r.nextDouble() - 0.5) *
      math.pow(10, r.nextInt(20) - 10))
    for (a <- vals; b <- Seq.fill(5)(vals(r.nextInt(vals.size)))) {
      val (ea, eb) = (ZOrder.encode(a), ZOrder.encode(b))
      assert(((a < b) == unsignedLt(ea, eb)) || a == b,
        s"order broken for $a vs $b")
    }
  }

  test("string encoding preserves order on the first 8 bytes") {
    val r = new Random(93)
    val vals = Seq("", "a", "aa", "ab", "b", "zzzzzzzzz") ++
      Seq.fill(300)(r.alphanumeric.take(r.nextInt(12)).mkString)
    for (a <- vals; b <- Seq.fill(5)(vals(r.nextInt(vals.size)))) {
      val (ta, tb) = (a.take(8), b.take(8))
      val cmp = unsignedLt(ZOrder.encode(a), ZOrder.encode(b))
      if (cmp) assert(ta <= tb, s"order broken for '$a' vs '$b'")
      if (ta < tb) assert(cmp || ZOrder.encode(a).sameElements(ZOrder.encode(b)))
    }
  }

  test("interleave lays dimension bits round-robin") {
    val ones = Array.fill[Byte](8)(0xff.toByte)
    val zeros = Array.fill[Byte](8)(0)
    val z = ZOrder.interleave(Array(ones, zeros))
    assert(z.length == 16)
    assert(z.forall(_ == 0xaa.toByte), "1-0 alternating = 0xAA bytes")
    val z2 = ZOrder.interleave(Array(zeros, ones))
    assert(z2.forall(_ == 0x55.toByte), "0-1 alternating = 0x55 bytes")
  }

  test("zValue column clusters a 2-d grid so both dimensions band") {
    import spark.implicits._
    // 16x16 grid; z-sort then split into 4 quarters: each quarter must
    // cover a bounded sub-square, not a full-width stripe
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val sorted = df.withColumn("z", ZOrder.zValue(df, Seq("x", "y")))
      .orderBy("z").select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    val quarters = sorted.grouped(64).toSeq
    assert(quarters.size == 4)
    quarters.foreach { q =>
      val (xs, ys) = (q.map(_._1), q.map(_._2))
      assert(xs.max - xs.min <= 8, s"x band too wide: ${xs.min}..${xs.max}")
      assert(ys.max - ys.min <= 8, s"y band too wide: ${ys.min}..${ys.max}")
    }
  }

  test("null and unsupported types") {
    assert(ZOrder.encode(null).forall(_ == 0))
    intercept[IllegalArgumentException](ZOrder.encode(new Object))
    import spark.implicits._
    val df = Seq((1L, Array(1.0))).toDF("a", "emb")
    intercept[IllegalArgumentException](ZOrder.zValue(df, Seq("a", "emb")))
    intercept[IllegalArgumentException](ZOrder.zValue(df, Seq("a")))
  }
}
