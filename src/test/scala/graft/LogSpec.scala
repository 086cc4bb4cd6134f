package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Dual-stream logging (custom_logging.py:5-29 analog): both streams
  * receive their events, events never cross streams, and the error
  * stream's level config drops sub-ERROR records. */
class LogSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("monitor and error streams receive the right events, separately") {
    SparkEntry.queries("ingest_integrity")(spark, sf).collect()
    val monitor = Files.readString(Path.of(GraftLog.monitorPath))
    val error = Files.readString(Path.of(GraftLog.errorPath))
    assert(monitor.contains("ingest_integrity: sink written and verified"),
      s"monitor stream missing lifecycle event:\n$monitor")
    assert(error.contains("failed the size check and were quarantined"),
      s"error stream missing quarantine event:\n$error")
    // separation: lifecycle events never reach the error stream and
    // failure events never reach the monitor stream (additivity off)
    assert(!error.contains("sink written"), error)
    assert(!monitor.contains("failed the size check"), monitor)
  }

  test("error stream level drops sub-ERROR records") {
    GraftLog.init()
    org.apache.logging.log4j.LogManager.getLogger("graft.error")
      .info("info-record-must-drop")
    val error = Files.readString(Path.of(GraftLog.errorPath))
    assert(!error.contains("info-record-must-drop"), error)
  }
}
