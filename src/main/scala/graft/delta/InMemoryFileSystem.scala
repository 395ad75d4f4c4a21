package graft.delta

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * In-process, in-memory object store exposed as a Hadoop `FileSystem`
 * (`mem://store/...`) — the analog of the reference's in-memory
 * StorageBackend (reference: src/storage/memory.ts:70). The reference keys
 * objects in a JS `Map` behind the same interface as its S3/R2/filesystem
 * backends; here the common interface is Hadoop's, which means the WHOLE
 * stack — transaction log, checkpoint parquet, Spark's own scan/write paths
 * with their committer rename dance — runs against memory with zero disk
 * I/O. Each URI authority ("store" above) is an independent namespace, so
 * suites get isolation by picking fresh authorities.
 *
 * Directories are implicit (a path is a directory when it is an explicit
 * `mkdirs` entry or a proper prefix of any object key), matching object-store
 * semantics; `listStatus` scans the flat key map, which is exactly the
 * reference memory backend's list-by-prefix and fine at test scale.
 *
 * [[InMemoryFileSystem.install]] wires the scheme into a session and
 * registers an atomic [[CommitStore]] (ConcurrentHashMap `putIfAbsent` as
 * the arbiter, same contract as [[InMemoryObjectApi]]) so OCC commits are
 * genuinely conditional rather than check-then-create.
 */
final class InMemoryFileSystem extends FileSystem {
  import InMemoryFileSystem._

  private var uri: URI = _
  private var store: Store = _
  private var authority: String = "default"
  private var workingDir: Path = _
  private var boundScheme: String = Scheme

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    // Serve whatever scheme this instance was registered under
    // (fs.<scheme>.impl): besides the canonical `mem://`, specs register it
    // as e.g. `fs.s3.impl` to emulate an object-store DATA plane next to the
    // HTTP conditional-PUT commit emulator (see StorageUrlSpec). The store
    // namespace stays keyed by authority alone, so pick distinct authorities
    // per suite as before.
    boundScheme = Option(name.getScheme).getOrElse(Scheme)
    uri = URI.create(s"$boundScheme://${Option(name.getAuthority).getOrElse("default")}")
    authority = Option(name.getAuthority).getOrElse("default")
    store = storeFor(authority)
    workingDir = new Path(uri.toString + "/")
  }

  override def getScheme: String = boundScheme
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }

  /** Absolute key for `p`: the URI path with no trailing slash ("" = root). */
  private def key(p: Path): String = {
    val abs = if (p.isAbsolute) p else new Path(workingDir, p)
    val raw = abs.toUri.getPath
    if (raw == "/" || raw.isEmpty) "" else raw.stripSuffix("/")
  }

  override def getFileStatus(p: Path): FileStatus = {
    sleepFor(authority, _.readMs) // a HEAD costs one read RTT
    val k = key(p)
    val f = store.files.get(k)
    if (f != null)
      new FileStatus(f.bytes.length.toLong, false, 1, BlockSize, f.modTime, qualify(k))
    else if (isDir(k))
      new FileStatus(0, true, 1, BlockSize, 0L, qualify(k))
    else throw new FileNotFoundException(s"$Scheme: $p")
  }

  private def isDir(k: String): Boolean =
    k.isEmpty || store.dirs.containsKey(k) || {
      val prefix = k + "/"
      store.files.keySet.iterator().hasNextUnder(prefix) ||
        store.dirs.keySet.iterator().hasNextUnder(prefix)
    }

  private def qualify(k: String): Path =
    new Path(uri.toString + (if (k.isEmpty) "/" else k))

  override def exists(p: Path): Boolean =
    try { getFileStatus(p); true } catch { case _: FileNotFoundException => false }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    sleepFor(authority, _.readMs)
    val f = store.files.get(key(p))
    if (f == null) throw new FileNotFoundException(s"$Scheme: $p")
    new FSDataInputStream(new SeekableBytes(f.bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (!k.isEmpty && isDir(k))
      throw new FileAlreadyExistsException(s"directory exists: $p")
    if (!overwrite && store.files.containsKey(k))
      throw new FileAlreadyExistsException(s"$Scheme: $p")
    val buf = new ByteArrayOutputStream()
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        sleepFor(authority, _.writeMs) // one PUT per closed stream
        val bytes = buf.toByteArray
        if (overwrite) store.files.put(k, FileEntry(bytes, System.currentTimeMillis()))
        else if (store.files.putIfAbsent(k, FileEntry(bytes, System.currentTimeMillis())) != null)
          throw new FileAlreadyExistsException(s"$Scheme: $p (lost create race)")
        ()
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$Scheme does not support append")

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src); val dk = key(dst)
    val f = store.files.get(sk)
    if (f != null) {
      // file → file (or into an existing directory, per FileSystem contract)
      val target = if (isDir(dk) && !dk.isEmpty) dk + "/" + src.getName else dk
      if (store.files.containsKey(target)) return false
      store.files.put(target, f)
      store.files.remove(sk)
      true
    } else if (isDir(sk)) {
      val target = if (isDir(dk) && !dk.isEmpty && dk != sk) dk + "/" + src.getName else dk
      if (store.files.containsKey(target)) return false
      val prefix = sk + "/"
      store.dirs.remove(sk); store.dirs.put(target, java.lang.Boolean.TRUE)
      val fileKeys = store.files.keySet.iterator()
      val movesF = scala.collection.mutable.ArrayBuffer.empty[String]
      while (fileKeys.hasNext) { val k = fileKeys.next(); if (k.startsWith(prefix)) movesF += k }
      movesF.foreach { k =>
        store.files.put(target + "/" + k.substring(prefix.length), store.files.get(k))
        store.files.remove(k)
      }
      val dirKeys = store.dirs.keySet.iterator()
      val movesD = scala.collection.mutable.ArrayBuffer.empty[String]
      while (dirKeys.hasNext) { val k = dirKeys.next(); if (k.startsWith(prefix)) movesD += k }
      movesD.foreach { k =>
        store.dirs.put(target + "/" + k.substring(prefix.length), java.lang.Boolean.TRUE)
        store.dirs.remove(k)
      }
      true
    } else false
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    if (store.files.remove(k) != null) return true
    if (!isDir(k)) return false
    val prefix = if (k.isEmpty) "" else k + "/"
    val hasChildren = store.files.keySet.iterator().hasNextUnder(prefix) ||
      store.dirs.keySet.iterator().hasNextUnder(prefix)
    if (hasChildren && !recursive)
      throw new IOException(s"directory not empty: $p")
    val fs = store.files.keySet.iterator()
    val dropF = scala.collection.mutable.ArrayBuffer.empty[String]
    while (fs.hasNext) { val kk = fs.next(); if (kk.startsWith(prefix)) dropF += kk }
    dropF.foreach(store.files.remove)
    val ds = store.dirs.keySet.iterator()
    val dropD = scala.collection.mutable.ArrayBuffer.empty[String]
    while (ds.hasNext) { val kk = ds.next(); if (kk == k || kk.startsWith(prefix)) dropD += kk }
    dropD.foreach(store.dirs.remove)
    store.dirs.remove(k)
    true
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    sleepFor(authority, _.listMs)
    val k = key(p)
    if (store.files.containsKey(k)) return Array(getFileStatus(p))
    if (!isDir(k)) throw new FileNotFoundException(s"$Scheme: $p")
    val prefix = if (k.isEmpty) "" else k + "/"
    val children = scala.collection.mutable.SortedSet.empty[String]
    val fi = store.files.keySet.iterator()
    while (fi.hasNext) {
      val kk = fi.next()
      if (kk.startsWith(prefix) && kk.length > prefix.length) {
        val rest = kk.substring(prefix.length)
        val slash = rest.indexOf('/')
        children += (if (slash < 0) kk else prefix + rest.substring(0, slash))
      }
    }
    val di = store.dirs.keySet.iterator()
    while (di.hasNext) {
      val kk = di.next()
      if (kk.startsWith(prefix) && kk.length > prefix.length) {
        val rest = kk.substring(prefix.length)
        val slash = rest.indexOf('/')
        children += (if (slash < 0) kk else prefix + rest.substring(0, slash))
      }
    }
    // Statuses come straight from the key map — NOT via per-child
    // getFileStatus: (a) an entry can vanish between the enumeration and a
    // re-stat (a racer deleting its checkpoint temp dir — skip it; the
    // Hadoop contract only demands FileNotFound when the LISTED DIRECTORY
    // itself is gone), and (b) a real object store's LIST returns object
    // metadata inline, so a listing must not pay one injected-HEAD RTT per
    // entry under the latency soak.
    children.iterator.flatMap { c =>
      val f = store.files.get(c)
      if (f != null)
        Iterator.single(new FileStatus(f.bytes.length.toLong, false, 1,
          BlockSize, f.modTime, qualify(c)))
      else if (isDir(c))
        Iterator.single(new FileStatus(0, true, 1, BlockSize, 0L, qualify(c)))
      else Iterator.empty // vanished mid-listing
    }.toArray
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    var k = key(p)
    if (store.files.containsKey(k))
      throw new FileAlreadyExistsException(s"file exists: $p")
    while (k.nonEmpty) {
      store.dirs.put(k, java.lang.Boolean.TRUE)
      val slash = k.lastIndexOf('/')
      k = if (slash <= 0) "" else k.substring(0, slash)
    }
    true
  }
}

object InMemoryFileSystem {
  val Scheme = "mem"
  private val BlockSize = 32L * 1024 * 1024

  private[delta] final case class FileEntry(bytes: Array[Byte], modTime: Long)
  private[delta] final class Store {
    val files = new ConcurrentHashMap[String, FileEntry]()
    val dirs = new ConcurrentHashMap[String, java.lang.Boolean]()
  }

  private val stores = new ConcurrentHashMap[String, Store]()
  private[delta] def storeFor(authority: String): Store =
    stores.computeIfAbsent(authority, _ => new Store)

  /** Drop every object under `authority` (fresh namespace for a suite). */
  def clear(authority: String): Unit = { stores.remove(authority); () }

  /** Injected per-operation latencies for one authority — models a real
    * object store's RTTs (the reference's own ops numbers are ~10/20/5 ms
    * read/write/list, /root/reference/OPERATIONS.md) so commit-throughput
    * soaks measure protocol behavior under realistic storage cost instead
    * of nanosecond map lookups. Zero-cost when unset. */
  final case class Latency(readMs: Long, writeMs: Long, listMs: Long)
  private val latencies = new ConcurrentHashMap[String, Latency]()
  def setLatency(authority: String, l: Latency): Unit = { latencies.put(authority, l); () }
  def clearLatency(authority: String): Unit = { latencies.remove(authority); () }
  private[delta] def sleepFor(authority: String, pick: Latency => Long): Unit = {
    val l = latencies.get(authority)
    if (l != null) {
      val ms = pick(l)
      if (ms > 0) Thread.sleep(ms)
    }
  }

  /** Conditional-put census for soaks: total attempts and lost races
    * (putIfAbsent that found the object already there — exactly one per
    * OCC retry), keyed by authority. */
  private[delta] val putAttempts = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private[delta] val putLost = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def counter(m: ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong],
                      a: String) =
    m.computeIfAbsent(a, _ => new java.util.concurrent.atomic.AtomicLong)
  def putCensus(authority: String): (Long, Long) =
    (counter(putAttempts, authority).get, counter(putLost, authority).get)
  def resetPutCensus(authority: String): Unit = {
    counter(putAttempts, authority).set(0)
    counter(putLost, authority).set(0)
  }

  /** Byte-array stream with the seek/pread surface `FSDataInputStream`
    * demands (parquet footer reads are positioned reads). */
  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes)
      with Seekable with PositionedReadable {
    override def seek(pos: Long): Unit = {
      if (pos < 0 || pos > bytes.length) throw new IOException(s"bad seek $pos")
      this.pos = pos.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (position + length > bytes.length) throw new java.io.EOFException()
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  private implicit final class PrefixIter(private val it: java.util.Iterator[String])
      extends AnyVal {
    def hasNextUnder(prefix: String): Boolean = {
      while (it.hasNext) if (it.next().startsWith(prefix)) return true
      false
    }
  }

  /**
   * Wire `mem://` into `spark`'s Hadoop configuration and register the
   * scheme's [[CommitStore]]: OCC arbitration is the store map's atomic
   * `putIfAbsent` — a genuine conditional create, same contract the
   * reference's memory backend implements with its JS Map
   * (src/storage/memory.ts:70) and S3 with `If-None-Match`.
   */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$Scheme.impl", classOf[InMemoryFileSystem].getName)
    // FileSystem instances are cached per (scheme, authority, conf); the
    // memory store itself is static, so caching is safe and fast.
    DeltaLog.registerCommitStore(Scheme, fs => new CommitStore {
      override def putIfAbsent(path: Path, body: Array[Byte]): Boolean = {
        val auth = Option(path.toUri.getAuthority).getOrElse("default")
        val store = storeFor(auth)
        val k = path.toUri.getPath.stripSuffix("/")
        sleepFor(auth, _.writeMs) // a conditional PUT costs one write RTT
        val won =
          store.files.putIfAbsent(k, FileEntry(body, System.currentTimeMillis())) == null
        counter(putAttempts, auth).incrementAndGet()
        if (!won) counter(putLost, auth).incrementAndGet()
        won
      }
    })
  }
}
