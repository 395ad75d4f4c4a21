package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Pluggable Logger (reference: setLogger/getLogger, src/utils/index.ts:45-105). */
class LoggingSpec extends AnyFunSuite {

  test("setLogger swaps the sink; reset restores the default; debug is lazy") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val probe = new Logger {
      override def debug(m: => String): Unit = seen += (("debug", m))
      override def info(m: => String): Unit = seen += (("info", m))
      override def warn(m: => String): Unit = seen += (("warn", m))
      override def error(m: => String): Unit = seen += (("error", m))
    }
    try {
      Logging.setLogger(probe)
      Logging.logger.info("hello")
      Logging.logger.warn("careful")
      Logging.logger.error("boom")
      assert(seen.toList == List(
        ("info", "hello"), ("warn", "careful"), ("error", "boom")))
      // default logger never evaluates suppressed debug messages
      Logging.reset()
      var evaluated = false
      Logging.logger.debug { evaluated = true; "never" }
      assert(!evaluated)
      assert(Logging.logger == Logging.DefaultLogger)
    } finally Logging.reset()
  }
}
