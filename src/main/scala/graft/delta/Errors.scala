package graft.delta

/**
 * Typed error taxonomy users can program against, mirroring the reference's
 * error hierarchy (reference: src/errors.ts:46-340 — DeltaLakeError base
 * with a stable `code` for programmatic handling; StorageError carrying
 * path/operation; FileNotFoundError; VersionMismatchError for conditional
 * writes; ConcurrencyError; CDCError; ValidationError). JVM idioms apply:
 * `code` is a field, the cause rides the Throwable chain, and catching
 * [[DeltaException]] catches everything this library raises deliberately.
 */
abstract class DeltaException(message: String, val code: String,
                              cause: Throwable = null)
  extends RuntimeException(message, cause)

/** Storage-layer failure (reference: StorageError, src/errors.ts:82-95). */
class StorageException(message: String, val path: String, val operation: String,
                       cause: Throwable = null, code: String = "STORAGE_ERROR")
  extends DeltaException(message, code, cause)

/** Missing file/object (reference: FileNotFoundError, src/errors.ts:102-107). */
final class FileMissingException(path: String, operation: String = "read")
  extends StorageException(s"File not found: $path", path, operation,
    null, "FILE_NOT_FOUND")

/** A conditional write lost to another writer (reference:
  * VersionMismatchError, src/errors.ts:128-155). */
final class VersionMismatchException(path: String,
    val expectedVersion: Option[String], val actualVersion: Option[String])
  extends StorageException(
    s"Version mismatch for $path: expected " +
      s"${expectedVersion.getOrElse("null (create)")}, got " +
      s"${actualVersion.getOrElse("null (not found)")}",
    path, "writeConditional", null, "VERSION_MISMATCH")

/** Raised when an optimistic commit loses the race for a version
  * (reference: ConcurrencyError, src/errors.ts:210 and
  * src/delta/table.ts:807-814). [[Retry.withRetry]] retries exactly this. */
class ConcurrencyException protected (message: String)
  extends DeltaException(message, "CONCURRENCY_ERROR") {
  def this(version: Long) =
    this(s"commit $version already exists (concurrent writer)")
}

/** PERMANENT write-write conflict: a file this operation read was removed
  * or changed (DV mask, restore re-add) by a concurrent commit. Unlike a
  * plain commit-version race, re-attempting the same commit can never
  * succeed — the op's outputs were built from superseded content — so the
  * OCC loops must NOT burn retries on it ([[Retry.withRetry]] excludes it
  * from the default predicate). Subclasses ConcurrencyException so callers
  * observe the same failure type (and CONCURRENCY_ERROR code) either way,
  * but with a message that describes the permanent conflict rather than a
  * retryable version race. */
final class WriteConflictException(version: Long)
  extends ConcurrencyException(
    s"file(s) read by this operation were removed or changed by a " +
      s"concurrent commit before it could commit version $version; " +
      "re-run the operation against the current table state")
  with PermanentConflict

/** Marker for conflicts where RE-ATTEMPTING THE SAME COMMIT can never
  * succeed (the op's outputs were built from superseded state) —
  * [[Retry.withRetry]]'s default predicate excludes these from the
  * version-race retry budget. */
sealed trait PermanentConflict { self: ConcurrencyException => }

/** A concurrent INGEST commit for the same source already loaded file(s)
  * this ingest was about to commit. Like [[WriteConflictException]] this
  * is permanent for the attempted commit (re-committing it would
  * double-load), but the LOADER can recover: re-diff the skip-list
  * against the new log tail and retry with only the still-fresh files —
  * which is exactly what [[Ingest.run]] does. Subclasses
  * ConcurrencyException (excluded from the default retry predicate via
  * the same WriteConflict carve-out below). */
final class IngestConflictException(version: Long)
  extends ConcurrencyException(
    s"a concurrent ingest committed overlapping source file(s) at or " +
      s"before version $version; re-diff the skip-list and retry")
  with PermanentConflict

/** A concurrent write advanced an identity column's high-water mark
  * after this write assigned its values — committing would duplicate
  * identity values. Permanent for the staged files (they carry the stale
  * values); the write must re-run to re-assign. */
final class IdentityAllocationConflictException(col: String)
  extends ConcurrencyException(
    s"identity column '$col': a concurrent write advanced the high-water " +
      "mark after values were assigned; re-run the write to re-assign")
  with PermanentConflict

/** Change-data-capture failure (reference: CDCError, src/errors.ts:291). */
final class CdcException(message: String, cause: Throwable = null)
  extends DeltaException(message, "CDC_ERROR", cause)

/** Invalid user input (reference: ValidationError, src/errors.ts:326). */
final class ValidationException(message: String)
  extends DeltaException(message, "VALIDATION_ERROR")

/** A DELETE/UPDATE matched zero rows. The programmatic API throws this
  * (reference-API parity: the reference errors on no-op DML); the SQL
  * front door catches exactly this TYPE and treats it as a 0-row success
  * (SQL semantics). Subclasses IllegalArgumentException so pre-existing
  * callers that caught IAE keep working; the SQL layer must NOT match on
  * message text — a reworded message cannot change SQL no-op semantics. */
final class NoMatchedRowsException(op: String)
  extends IllegalArgumentException(s"$op matched no rows")

/** The table's protocol demands reader/writer features this engine does
  * not implement (north-star — Delta's InvalidProtocolVersionException;
  * refusing beats silently-wrong reads or contract-breaking writes). */
final class UnsupportedProtocolException(message: String)
  extends DeltaException(message, "UNSUPPORTED_PROTOCOL")

/** A streaming read hit a commit that deletes or rewrites live rows
  * (north-star — Delta's streaming source raises the same condition;
  * the reference surfaces row-level changes only via its CDC feed). */
final class StreamChangeException(message: String)
  extends DeltaException(message, "STREAM_CHANGED_DATA")

object Errors {

  /** Transient storage/network failure on a DRIVER read path: socket
    * timeouts, connection failures, and object-store 5xx surfaced by Hadoop
    * as plain IOExceptions. FileNotFound is NOT transient — a missing
    * commit is real state, not a blip. Walks the cause chain (Hadoop and
    * HTTP clients love wrapping). Executor-side reads get Spark's own task
    * retries; this classification exists for the driver-side log/CDC reads
    * that had no retry at all (reference wraps all storage ops:
    * src/delta/retry.ts:79-134). */
  def isTransientIo(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 10) {
      cur match {
        case _: java.io.FileNotFoundException => return false
        case _: java.net.SocketTimeoutException => return true
        case _: java.net.ConnectException => return true
        case _: java.io.InterruptedIOException => return true
        case _: java.io.IOException => return true
        case _ => ()
      }
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** Whether retrying the failed operation can succeed — optimistic-commit
    * losses and transient storage I/O (reference: isRetryableError,
    * src/errors.ts:407-414 — ConcurrencyError or an error flagged
    * `retryable: true`, which is how its storage layer marks transients;
    * [[Retry.withRetry]] applies this policy). */
  def isRetryable(t: Throwable): Boolean =
    t.isInstanceOf[ConcurrencyException] || isTransientIo(t)

  /** Human-readable byte count (reference: formatBytes,
    * src/delta/vacuum.ts:360-368 — same 1024 steps and 2-decimal trim). */
  def formatBytes(bytes: Long): String = {
    if (bytes == 0) return "0 Bytes"
    val sizes = Array("Bytes", "KB", "MB", "GB", "TB")
    val i = math.min(sizes.length - 1,
      (math.log(bytes.toDouble) / math.log(1024)).toInt)
    val v = bytes / math.pow(1024, i)
    val s = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString
    s"$s ${sizes(i)}"
  }

  /** Human-readable duration (reference: formatDuration,
    * src/delta/vacuum.ts:373-377). */
  def formatDuration(ms: Long): String =
    if (ms < 1000) s"${ms}ms"
    else if (ms < 60000) f"${ms / 1000.0}%.1fs"
    else f"${ms / 60000.0}%.1fm"
}
