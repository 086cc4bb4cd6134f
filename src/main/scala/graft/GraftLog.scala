package graft

import org.apache.logging.log4j.{Level, LogManager}

/** Dual-stream pipeline logging — the reference's two-logger scheme
  * (custom_logging.py:5-29, wired from config.py:32-42): a MONITOR
  * stream for lifecycle/accounting events and a separate ERROR stream
  * for failures, each with its own file appender, level, and format,
  * additivity off so events never cross streams. Configured
  * programmatically on the session's log4j2 context (the Spark-native
  * place for it — driver and executors already run log4j2), so the two
  * files are independently tail-able/queryable exactly like the
  * reference's log/monitor.log and log/error.log. Builder plumbing is
  * in [[Log4jSupport]] (Java — log4j2's recursive builder generics).
  */
object GraftLog {
  val monitorPath = s"${Tables.scratchRoot}/log/monitor.log"
  val errorPath = s"${Tables.scratchRoot}/log/error.log"

  @volatile private var configured = false

  /** Idempotent programmatic log4j2 setup of both streams. */
  def init(): Unit = synchronized {
    if (!configured) {
      new java.io.File(s"${Tables.scratchRoot}/log").mkdirs()
      Log4jSupport.addStream("graft.monitor", monitorPath, Level.INFO)
      // error stream admits ERROR+ only — an INFO sent here is dropped,
      // matching the reference's per-logger level config
      Log4jSupport.addStream("graft.error", errorPath, Level.ERROR)
      configured = true
    }
  }

  /** Lifecycle/accounting event (reference monitor_logger). */
  def monitor(msg: String): Unit = {
    init()
    LogManager.getLogger("graft.monitor").info(msg)
  }

  /** Failure event (reference error_logger). */
  def error(msg: String): Unit = {
    init()
    LogManager.getLogger("graft.error").error(msg)
  }
}
