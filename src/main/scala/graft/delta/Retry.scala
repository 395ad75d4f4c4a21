package graft.delta

/** Exponential backoff for optimistic-commit conflicts
  * (reference: src/delta/retry.ts:79-134; defaults at retry.ts:128-134). */
object Retry {

  final case class Policy(
      maxRetries: Int = 3,
      baseDelayMs: Long = 100,
      maxDelayMs: Long = 10000,
      multiplier: Double = 2.0,
      jitter: Double = 0.5)

  /** Re-run `op` with jittered backoff while `retryOn` classifies the
    * failure as retryable. The default retries only optimistic-commit
    * losses (the OCC loops); driver READ paths pass
    * [[Errors.isTransientIo]] — writes must never blind-retry transient
    * I/O, because a conditional put whose first attempt actually landed
    * would then race itself. */
  def withRetry[A](policy: Policy = Policy(),
                   retryOn: Throwable => Boolean = e =>
                     e.isInstanceOf[ConcurrencyException] &&
                       !e.isInstanceOf[PermanentConflict])(op: => A): A = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case scala.util.control.NonFatal(e) if retryOn(e) =>
          if (attempt >= policy.maxRetries) throw e
          val exp = policy.baseDelayMs * math.pow(policy.multiplier, attempt)
          val capped = math.min(exp, policy.maxDelayMs.toDouble)
          val jittered = capped * (1.0 - policy.jitter / 2 +
            scala.util.Random.nextDouble() * policy.jitter)
          Thread.sleep(jittered.toLong)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
