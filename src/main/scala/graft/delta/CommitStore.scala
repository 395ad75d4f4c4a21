package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * The transaction log's ONE correctness-critical storage primitive: atomic
 * create-if-not-exists of a commit file. Optimistic concurrency is arbitrated
 * entirely by this call — whichever writer creates `NNN.json` owns version N
 * (reference contract: src/storage/types.ts:81-233; the reference's S3/R2
 * backends arbitrate with ETag / `If-None-Match` conditional writes,
 * src/storage/s3.ts:40, src/storage/r2.ts:22-27).
 *
 * Implementations MUST be atomic against concurrent callers from SEPARATE
 * processes/drivers: a check-then-create emulation reintroduces the lost-
 * commit race this seam exists to eliminate.
 */
trait CommitStore {
  /** Atomically create `path` with `body` iff no object exists there.
    * @return true when THIS caller created the object; false when it already
    *         existed (some racer won). Any other failure throws. */
  def putIfAbsent(path: Path, body: Array[Byte]): Boolean
}

/** `file:` store: write-to-temp + POSIX `link(2)` (fails EEXIST atomically),
  * because Hadoop's local `create(overwrite=false)` is check-then-create.
  * A post-link content verify fails loudly if the filesystem downgraded the
  * link to copy semantics. */
final class LinkCommitStore extends CommitStore {
  override def putIfAbsent(target: Path, body: Array[Byte]): Boolean = {
    val targetNio = java.nio.file.Paths.get(target.toUri.getPath)
    val tmpNio = targetNio.resolveSibling(
      s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    java.nio.file.Files.write(tmpNio, body)
    try {
      val won =
        try { java.nio.file.Files.createLink(targetNio, tmpNio); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (won &&
          !java.util.Arrays.equals(java.nio.file.Files.readAllBytes(targetNio), body))
        throw new StorageException(
          s"commit verify failed after link: $target", target.toString, "putIfAbsent")
      won
    } finally {
      java.nio.file.Files.deleteIfExists(tmpNio)
      ()
    }
  }
}

/** Store for filesystems whose `create(overwrite=false)` IS atomic (HDFS
  * namenode-arbitrated create; local-FS and most object-store connectors are
  * NOT — see [[LinkCommitStore]] and [[ConditionalPutCommitStore]]). */
final class AtomicCreateCommitStore(fs: FileSystem) extends CommitStore {
  override def putIfAbsent(target: Path, body: Array[Byte]): Boolean = {
    val created =
      try Some(fs.create(target, /*overwrite=*/ false))
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException => None
      }
    created match {
      case None => false
      case Some(out) =>
        try out.write(body) finally out.close()
        true
    }
  }
}

/** Minimal object-store surface for conditional writes — the shape of S3
  * `PutObject` with `If-None-Match: *` (R2 and GCS expose equivalents).
  * Implement over the target store's SDK; the PUT must be conditional ON THE
  * SERVER — a client-side exists-then-put emulation is exactly the race this
  * seam eliminates. [[InMemoryObjectApi]] emulates the atomicity contract
  * for tests. */
trait ObjectApi {
  /** Store `body` at `key` iff no object exists there; true when stored. */
  def putIfNoneMatch(key: String, body: Array[Byte]): Boolean
}

/** Object-store commit store: OCC arbitrated by the store's own conditional
  * PUT, replacing the ACID-by-hope warning path for s3/gs/abfs-style schemes
  * (register via [[DeltaLog.registerCommitStore]]). */
final class ConditionalPutCommitStore(api: ObjectApi) extends CommitStore {
  override def putIfAbsent(path: Path, body: Array[Byte]): Boolean =
    api.putIfNoneMatch(path.toUri.toString, body)
}

/** Test double with server-side-atomic conditional PUT semantics
  * (ConcurrentHashMap.putIfAbsent is the arbiter). `materialize` mirrors the
  * winning object into a real filesystem so log READERS observe what the
  * object store accepted. */
final class InMemoryObjectApi(materialize: (String, Array[Byte]) => Unit = (_, _) => ())
  extends ObjectApi {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  val putAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
  override def putIfNoneMatch(key: String, body: Array[Byte]): Boolean = {
    putAttempts.incrementAndGet()
    val won = objects.putIfAbsent(key, body) == null
    if (won) materialize(key, body)
    won
  }
  def get(key: String): Option[Array[Byte]] = Option(objects.get(key))
}
