package graft.delta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.charset.StandardCharsets

/** Raised when an optimistic commit loses the race for a version
  * (reference: ConcurrencyError, src/delta/table.ts:807-814). */
final class ConcurrencyException(version: Long)
  extends RuntimeException(s"commit $version already exists (concurrent writer)")

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

  def listCommitVersions(): Seq[Long] =
    if (!fs.exists(logPath)) Nil
    else fs.listStatus(logPath).iterator
      .map(_.getPath.getName)
      .collect { case CommitName(v) => v }
      .toSeq.sorted

  private object CommitName {
    private val Re = raw"(\d{20})\.json".r
    def unapply(name: String): Option[Long] = name match {
      case Re(v) => Some(v.toLong)
      case _ => None
    }
  }

  def readCommit(version: Long): Seq[Action] =
    Actions.fromNdjson(readString(commitFile(version)))

  /**
   * Atomically write commit `version`. Losing the race for a version throws
   * [[ConcurrencyException]] and callers retry on a fresh snapshot
   * (reference: src/delta/retry.ts:79-134).
   *
   * STORAGE CONTRACT (reference: src/storage/types.ts:81-119): correctness
   * requires an ATOMIC create-if-not-exists. Hadoop's local filesystem (and
   * S3A) implement `create(path, overwrite=false)` as check-then-create, so
   * two drivers racing the same version could both "succeed" and one commit
   * would be silently overwritten. On `file:` URIs we therefore commit via
   * write-to-temp + hard-link (POSIX `link(2)` fails with EEXIST atomically),
   * with a post-link content verify. Other schemes use `create(overwrite
   * = false)` and require the filesystem to honor it atomically (HDFS does;
   * plain S3 needs an external log store or if-none-match support).
   */
  def writeCommit(version: Long, actions: Seq[Action]): Unit = {
    fs.mkdirs(logPath)
    val target = commitFile(version)
    if (fs.exists(target)) throw new ConcurrencyException(version)
    val body = Actions.toNdjson(actions).getBytes(StandardCharsets.UTF_8)
    if ("file" == Option(fs.getUri.getScheme).getOrElse("")) {
      val targetNio = java.nio.file.Paths.get(target.toUri.getPath)
      val tmpNio = targetNio.resolveSibling(
        s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.write(tmpNio, body)
      try {
        try java.nio.file.Files.createLink(targetNio, tmpNio)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new ConcurrencyException(version)
        }
        // Post-link verify: the link call is the atomic arbiter, but a
        // filesystem that downgraded it to copy semantics would corrupt the
        // log silently — fail loudly instead.
        if (!java.util.Arrays.equals(java.nio.file.Files.readAllBytes(targetNio), body))
          throw new java.io.IOException(s"commit $version verify failed after link")
      } finally java.nio.file.Files.deleteIfExists(tmpNio)
    } else {
      // Object stores whose Hadoop connectors implement create(overwrite =
      // false) as check-then-create cannot give single-writer-wins OCC by
      // themselves (S3 needs if-none-match conditional PUT or an external
      // log store). Warn once per scheme rather than silently voiding the
      // ACID claim for multi-driver deployments.
      val scheme = Option(fs.getUri.getScheme).getOrElse("")
      if (DeltaLog.NonAtomicCreateSchemes(scheme) && DeltaLog.warnedSchemes.add(scheme))
        System.err.println(
          s"[graft.DeltaLog] scheme '$scheme' does not guarantee atomic " +
            "create-if-not-exists: concurrent writers from separate drivers " +
            "may overwrite commits. Use a coordinating log store or a " +
            "conditional-write-capable connector for multi-writer safety.")
      val out =
        try fs.create(target, /*overwrite=*/ false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
               _: java.nio.file.FileAlreadyExistsException =>
            throw new ConcurrencyException(version)
        }
      try out.write(body)
      finally out.close()
    }
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

  def readString(p: Path): String = {
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
}
