package graft.delta

/**
 * Pluggable library logger (reference: Logger / setLogger / getLogger,
 * src/utils/index.ts:45-105). Messages are by-name so suppressed levels
 * cost nothing. The default mirrors the reference: debug silenced, info to
 * stdout, warn/error to stderr. Swap in an slf4j/log4j bridge with
 * [[Logging.setLogger]]; [[Logging.reset]] restores the default.
 */
trait Logger extends Serializable {
  def debug(message: => String): Unit
  def info(message: => String): Unit
  def warn(message: => String): Unit
  def error(message: => String): Unit
}

object Logging {

  /** debug: no-op; info/warn/error: stderr. (The reference sends info to
    * stdout, src/utils/index.ts:64-69; here EVERY level goes to stderr
    * because stdout is the driver's data channel — `graft.Bench` must emit
    * exactly one JSON line — and Spark's own logging is stderr-side too.) */
  object DefaultLogger extends Logger {
    override def debug(message: => String): Unit = ()
    override def info(message: => String): Unit = Console.err.println(message)
    override def warn(message: => String): Unit = Console.err.println(message)
    override def error(message: => String): Unit = Console.err.println(message)
  }

  /** Drops everything — for benchmarks and tests that assert clean output. */
  object SilentLogger extends Logger {
    override def debug(message: => String): Unit = ()
    override def info(message: => String): Unit = ()
    override def warn(message: => String): Unit = ()
    override def error(message: => String): Unit = ()
  }

  @volatile private var current: Logger = DefaultLogger

  def setLogger(l: Logger): Unit = { current = l }
  def reset(): Unit = { current = DefaultLogger }
  def logger: Logger = current

  /** Label every Spark job `body` submits with a phase name (guide §1.5:
    * "label your jobs") — the bench/profiling listeners attribute wall time
    * to engine phases by this description. Thread-local save/restore so a
    * caller's own description is untouched. Zero data-path cost. */
  def withJobDesc[T](spark: org.apache.spark.sql.SparkSession,
                     desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val old = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(old)
  }
}
