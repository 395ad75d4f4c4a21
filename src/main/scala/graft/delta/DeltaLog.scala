package graft.delta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.charset.StandardCharsets

/**
 * The transaction log: 20-digit zero-padded NDJSON commits under
 * `<table>/_delta_log/` (reference: src/utils/index.ts:140-146,170-184),
 * with optimistic concurrency via atomic create-if-not-exists
 * (reference: src/delta/table.ts:801; contract src/storage/types.ts:81-119).
 *
 * All log I/O is driver-side (commit files are small); data files are
 * read/written by executors through the DataFrame API.
 */
final class DeltaLog(val tablePath: Path, val hadoopConf: Configuration) {

  val fs: FileSystem = tablePath.getFileSystem(hadoopConf)
  val logPath: Path = new Path(tablePath, "_delta_log")

  def commitFile(version: Long): Path = new Path(logPath, f"$version%020d.json")
  def checkpointFile(version: Long): Path =
    new Path(logPath, f"$version%020d.checkpoint.parquet")
  def checkpointPart(version: Long, part: Int, parts: Int): Path =
    new Path(logPath, f"$version%020d.checkpoint.$part%010d.$parts%010d.parquet")
  def lastCheckpointFile: Path = new Path(logPath, "_last_checkpoint")

  /** Latest committed version, or -1 for an empty/nonexistent log. */
  /** Latest known version: the newest commit file, or — when log cleanup has
    * removed every commit at/below a checkpoint — the checkpointed version
    * itself (the checkpoint is complete state, so the version is live even
    * with no commit JSON present). */
  def latestVersion(): Long = {
    val fromCommits = listCommitVersions().lastOption.getOrElse(-1L)
    val fromCheckpoint = readLastCheckpoint().map(_._1).getOrElse(-1L)
    math.max(fromCommits, fromCheckpoint)
  }

  def listCommitVersions(): Seq[Long] = Retry.withRetry(retryOn = Errors.isTransientIo) {
    if (!fs.exists(logPath)) Nil
    else fs.listStatus(logPath).iterator
      .map(_.getPath.getName)
      .collect { case CommitName(v) => v }
      .toSeq.sorted
  }

  private object CommitName {
    private val Re = raw"(\d{20})\.json".r
    def unapply(name: String): Option[Long] = name match {
      case Re(v) => Some(v.toLong)
      case _ => None
    }
  }

  def readCommit(version: Long): Seq[Action] =
    Actions.fromNdjson(readString(commitFile(version)))

  /** Test/deployment hook: when set, OCC goes through this store regardless
    * of scheme (e.g. a [[ConditionalPutCommitStore]] in specs). Prefer
    * [[DeltaLog.registerCommitStore]] for scheme-wide wiring. */
  private[delta] var commitStoreOverride: Option[CommitStore] = None

  /** STORAGE CONTRACT (reference: src/storage/types.ts:81-119): correctness
    * requires an ATOMIC create-if-not-exists; see [[CommitStore]]. Selection:
    * an explicit override, then a scheme-registered factory (the object-store
    * path — [[ConditionalPutCommitStore]] over the store's `If-None-Match`
    * PUT), then `link(2)` for `file:` (local `create(overwrite=false)` is
    * check-then-create), then plain atomic create (HDFS honors it; known
    * non-atomic schemes get a one-time warning rather than a silently void
    * ACID claim). */
  private def commitStore: CommitStore = commitStoreOverride.getOrElse {
    val scheme = Option(fs.getUri.getScheme).getOrElse("")
    Option(DeltaLog.storeFactories.get(scheme)).map(_(fs)).getOrElse {
      if (scheme == "file") DeltaLog.linkStore
      else {
        if (DeltaLog.NonAtomicCreateSchemes(scheme) && DeltaLog.warnedSchemes.add(scheme))
          Logging.logger.warn(
            s"[graft.DeltaLog] scheme '$scheme' does not guarantee atomic " +
              "create-if-not-exists: concurrent writers from separate drivers " +
              "may overwrite commits. Register a conditional-write CommitStore " +
              "(DeltaLog.registerCommitStore) for multi-writer safety.")
        new AtomicCreateCommitStore(fs)
      }
    }
  }

  /**
   * Atomically write commit `version`. Losing the race for a version throws
   * [[ConcurrencyException]] and callers retry on a fresh snapshot
   * (reference: src/delta/retry.ts:79-134). Atomicity is delegated to the
   * scheme-appropriate [[CommitStore]] (see [[commitStore]]).
   */
  def writeCommit(version: Long, actions: Seq[Action]): Unit = {
    fs.mkdirs(logPath)
    val target = commitFile(version)
    if (fs.exists(target)) throw new ConcurrencyException(version)
    val body = Actions.toNdjson(actions).getBytes(StandardCharsets.UTF_8)
    if (!commitStore.putIfAbsent(target, body))
      throw new ConcurrencyException(version)
  }

  // ---- _last_checkpoint ----------------------------------------------------

  /** `{version, size, parts?}` (reference: src/delta/types.ts:334-340). */
  def readLastCheckpoint(): Option[(Long, Long, Option[Int])] = {
    if (!fs.exists(lastCheckpointFile)) return None
    scala.util.Try {
      val j = JsonMethods.parse(readString(lastCheckpointFile))
      val v = j \ "version" match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => -1L }
      val size = j \ "size" match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L }
      val parts = j \ "parts" match { case JInt(n) => Some(n.toInt); case _ => None }
      (v, size, parts)
    }.toOption.filter(_._1 >= 0)
  }

  def writeLastCheckpoint(version: Long, size: Long, parts: Option[Int]): Unit = {
    val base = s"""{"version":$version,"size":$size"""
    val body = parts.fold(base)(p => s"""$base,"parts":$p""") + "}"
    writeString(lastCheckpointFile, body, overwrite = true)
  }

  // ---- small-file helpers --------------------------------------------------

  /** Driver-side small-file read with transient-failure retry: commit
    * NDJSON, `_last_checkpoint`, CDC sidecars all come through here, and an
    * object-store 5xx on any of them used to fail the query immediately
    * (executor reads get Spark task retries; the driver path got none —
    * reference wraps storage ops generally, src/delta/retry.ts:79-134). */
  def readString(p: Path): String = Retry.withRetry(retryOn = Errors.isTransientIo) {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeString(p: Path, content: String, overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}

object DeltaLog {
  /** Hadoop schemes whose create(overwrite=false) is check-then-create. */
  private val NonAtomicCreateSchemes =
    Set("s3a", "s3", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss")
  private val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val linkStore = new LinkCommitStore
  private val storeFactories =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem => CommitStore]()

  /** Wire a [[CommitStore]] factory for a URI scheme — the deployment hook
    * for object stores: back "s3a"/"gs"/… with a [[ConditionalPutCommitStore]]
    * over the store's conditional-PUT API and multi-writer OCC holds without
    * an external log store. Takes precedence over the built-in defaults. */
  def registerCommitStore(scheme: String, factory: FileSystem => CommitStore): Unit =
    storeFactories.put(scheme, factory)

  /** Remove a scheme registration (tests). */
  def unregisterCommitStore(scheme: String): Unit =
    storeFactories.remove(scheme)
}
