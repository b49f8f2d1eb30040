package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Counts ERROR events from Spark's janino code generator
  * (`CodeGenerator: Failed to compile …: Code grows beyond 64 KB`).
  *
  * A codegen compile failure is NOT a query failure — Spark silently
  * falls back to interpreted execution and the results stay correct —
  * which is exactly why it must be counted explicitly: the round-4 kNN
  * graph ran its hottest stage interpreted for a full round with every
  * correctness gate green. [[graft.Bench]] reports the count as
  * `codegen_errors` so a codegen regression fails loudly in the bench
  * line, and `CodegenGuardSpec` pins zero errors at production-scale
  * nlist in CI.
  */
object CodegenErrors {
  private val count = new AtomicLong(0)
  @volatile private var installed = false

  private final class Counter extends AbstractAppender(
    "graft-codegen-error-counter", null, null, true, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      if (event.getLevel.isMoreSpecificThan(Level.ERROR) &&
          event.getLoggerName != null &&
          event.getLoggerName.endsWith("CodeGenerator")) {
        count.incrementAndGet()
      }
    }
  }

  /** Attach the counter to the log4j2 root logger (idempotent). Must run
    * before the queries being watched; `setLogLevel` only changes levels,
    * so the appender survives session re-configuration.
    */
  def install(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val app = new Counter
      app.start()
      ctx.getConfiguration.addAppender(app)
      ctx.getConfiguration.getRootLogger.addAppender(app, Level.ERROR, null)
      ctx.updateLoggers()
      installed = true
    }
  }

  /** Total codegen compile errors observed since [[install]]. */
  def total: Long = count.get()
}
