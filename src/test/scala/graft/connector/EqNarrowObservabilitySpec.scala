package graft.connector

import graft.SparkSpec
import graft.format._
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.Files

/** The aggregated eq-delete narrowing summary must be OBSERVABLE: a
  * 100×-scale operator should see whether key-range narrowing is effective
  * (candidate delete files before → after, per planning pass) from the
  * driver log alone, without a profiler. */
class EqNarrowObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private final class Capture extends AbstractAppender(
      "graft-eqnarrow-capture", null, null, true,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    val messages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    override def append(e: LogEvent): Unit =
      messages.add(e.getMessage.getFormattedMessage)
  }

  test("planning logs one aggregated narrowing line at debug") {
    // ALL Spark work happens before the appender attaches: session/job
    // bring-up can reconfigure log4j and would drop a LoggerConfig added
    // too early
    val d = Files.createTempDirectory("graft-eqnarrow")
    Files.delete(d)
    val t = GraftTable.create(spark, d.toString,
      Seq((0L, "v")).toDF("id", "v").schema)
    (0 until 3).foreach { b =>
      GraftWrite.append(t, (b * 100 until b * 100 + 100)
        .map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
    }
    Deletes.deleteByEquality(t, Seq(105L, 150L).toDF("id"))
    val b = new GraftScanBuilder(spark, t, t.newScan(),
      CaseInsensitiveStringMap.empty())
    val batch = b.build().toBatch

    // attach a capture appender on the scan's logger, through the MAIN
    // classloader's log4j context (sbt's layered test classloader gets a
    // different one)
    val loggerName = classOf[GraftScan].getName
    val ctx = LogManager.getContext(classOf[GraftScan].getClassLoader, false)
      .asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val capture = new Capture
    capture.start()
    val existing = cfg.getLoggerConfig(loggerName)
    val lc =
      if (existing.getName == loggerName) existing
      else {
        val fresh = new org.apache.logging.log4j.core.config.LoggerConfig(
          loggerName, Level.DEBUG, true)
        cfg.addLogger(loggerName, fresh)
        fresh
      }
    val priorLevel = lc.getLevel
    lc.setLevel(Level.DEBUG)
    lc.addAppender(capture, Level.DEBUG, null)
    ctx.updateLoggers()
    try {
      batch.planInputPartitions()
      val hits = capture.messages.toArray(Array.empty[String])
        .filter(_.contains("eq-delete narrowing"))
      assert(hits.nonEmpty, "planning must emit the narrowing summary line")
      // the aggregate must reflect actual narrowing: candidates dropped
      // (the key set overlaps one of the three files' ranges)
      assert(hits.exists(_.matches(""".*\d+ tasks, candidate delete files \d+ -> \d+.*""")),
        s"unexpected line shape: ${hits.mkString("; ")}")
    } finally {
      lc.removeAppender(capture.getName)
      capture.stop()
      lc.setLevel(priorLevel)
      ctx.updateLoggers()
    }
  }
}
