package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import java.time.LocalDate

/** Transform semantics pinned to the reference's golden expectations
  * (api/src/test/.../transforms/TestBucketing.java, TestTruncate.java,
  * TestDates.java, TestTimestamps.java, TestBucketingProjection.java). */
class TransformsSpec extends AnyFunSuite {
  import Transforms._

  private def us(s: String): Long =
    java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000L

  test("bucket hash golden vectors (TestBucketing.java:64-116)") {
    // already pinned for Murmur3; assert through the transform too
    val b = BucketT(16)
    assert(b.hash(34, IntegerType) == 2017239379)
    assert(b.hash(34L, LongType) == 2017239379)
    assert(b.hash("iceberg", StringType) == 1210000089)
    assert(b.hash(1.0F, FloatType) == -142385009)
    assert(b.hash(1.0D, DoubleType) == -142385009)
  }

  test("bucket apply and projection") {
    val b = BucketT(16)
    val expected = (2017239379 & Integer.MAX_VALUE) % 16
    assert(b.apply(34, IntegerType) == expected)
    assert(b.project(PredOp.Eq, Seq(34), IntegerType)
      .contains((PredOp.Eq, Seq(expected))))
    assert(b.project(PredOp.Lt, Seq(34), IntegerType).isEmpty)
    assert(b.projectStrict(PredOp.NotEq, Seq(34), IntegerType)
      .contains((PredOp.NotEq, Seq(expected))))
  }

  test("truncate ints/longs/strings/decimal (TestTruncate.java)") {
    val t10 = TruncateT(10)
    assert(t10.apply(1, IntegerType) == 0)
    assert(t10.apply(-1, IntegerType) == -10)
    assert(t10.apply(-10, IntegerType) == -10)
    assert(t10.apply(-11, IntegerType) == -20)
    assert(t10.apply(11L, LongType) == 10L)
    val t5 = TruncateT(5)
    assert(t5.apply("abcdefg", StringType) == "abcde")
    assert(t5.apply("abc", StringType) == "abc")
    val t50 = TruncateT(50)
    assert(t50.apply(new java.math.BigDecimal("10.65"), DecimalType(5, 2))
      .asInstanceOf[java.math.BigDecimal].toPlainString == "10.50")
  }

  test("time ordinals are counts since epoch (TestDates/TestTimestamps)") {
    val d20171201 = LocalDate.of(2017, 12, 1).toEpochDay.toInt
    assert(DayT.apply(d20171201, DateType) == 17501)
    assert(YearT.apply(d20171201, DateType) == 47)
    assert(MonthT.apply(d20171201, DateType) == 575) // (2017-1970)*12 + 11
    val ts = us("2017-12-01T10:12:55.038")
    assert(YearT.apply(ts, TimestampType) == 47)
    assert(MonthT.apply(ts, TimestampType) == 575)
    assert(DayT.apply(ts, TimestampType) == 17501)
    assert(HourT.apply(ts, TimestampType) == 17501 * 24 + 10)
    // negative side of epoch floors correctly
    val before = us("1969-12-31T23:00:00")
    assert(DayT.apply(before, TimestampType) == -1)
    assert(HourT.apply(before, TimestampType) == -1)
  }

  test("monotone projections") {
    val d = LocalDate.of(2017, 12, 1).toEpochDay.toInt
    assert(DayT.project(PredOp.Lt, Seq(d), DateType).contains((PredOp.LtEq, Seq(17501))))
    assert(DayT.project(PredOp.Gt, Seq(d), DateType).contains((PredOp.GtEq, Seq(17501))))
    assert(DayT.projectStrict(PredOp.Lt, Seq(d), DateType).contains((PredOp.Lt, Seq(17501))))
    val t = TruncateT(10)
    assert(t.project(PredOp.StartsWith, Seq("abc"), StringType)
      .contains((PredOp.StartsWith, Seq("abc"))))
    assert(TruncateT(2).project(PredOp.StartsWith, Seq("abc"), StringType)
      .contains((PredOp.Eq, Seq("ab"))))
  }

  test("fromString round-trip") {
    Seq("identity", "void", "year", "month", "day", "hour", "bucket[16]",
      "truncate[4]").foreach { s =>
      assert(Transforms.fromString(s).toString == s)
    }
  }
}
