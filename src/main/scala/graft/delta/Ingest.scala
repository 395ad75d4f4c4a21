package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Idempotent file-level ingest — the COPY INTO verb: load from a source
 * directory only the files the table has NOT ingested before, in atomic
 * chunks, each chunk ONE transactional commit that carries both the data
 * and the loaded-file identities (so a crash between chunks loses nothing
 * and re-running skips exactly the committed chunks).
 *
 * File identity is (name, size, mtime): a re-offered unchanged file is
 * skipped, a file re-written in place (new size or mtime) re-ingests —
 * COPY INTO's contract. Identities live in each ingest commit's
 * `commitInfo.operationParameters` under chunked JSON, so the skip-list
 * is rebuilt from driver-side log metadata only. The source directory is
 * keyed by its NORMALIZED URI (`/path` and `/path/` are the same source).
 *
 * CONCURRENCY: ingest commits are appends, and appends never conflict at
 * the file level — so exactly-once needs its own guard. Each chunk commit
 * carries a tail-replay conflict ([[DeltaTable.write]]'s
 * `tailInfoConflict`): inside the OCC loop, any same-source INGEST commit
 * that landed after this loader's skip-list was computed and whose file
 * keys overlap ANY of the loader's not-yet-committed files (the union of
 * the remaining chunks, not just the one being committed — racing loaders
 * may chunk the listing differently) aborts the commit; the loader then
 * re-diffs its skip-list against the new log tail and retries with only
 * the still-fresh files. Two racing `graft_ingest` calls on the same
 * source therefore load every file exactly once (one wins each
 * overlapping chunk, the other skips it) instead of silently double-loading.
 *
 * CENSUS CHECKPOINT (round 13): the skip-list is carried forward in a
 * per-source sidecar (`_delta_log/_ingest_census.<md5(source)>.json`,
 * holding `{source, version, keys}` = the union of that source's INGEST
 * commits ≤ version). Rebuilding the skip-list reads the sidecar and
 * replays only the commit TAIL above its version — O(commits since the
 * last ingest), not O(retained log) — and read-repairs the sidecar to the
 * current head. The sidecar is a pure CACHE of log state: losing it (or a
 * racing overwrite by a concurrent loader) only widens the next rebuild's
 * tail replay; it can never invent keys the log didn't commit.
 *
 * Retention: because the sidecar SURVIVES log cleanup, files whose INGEST
 * commits were cleaned below the retention floor still skip when
 * re-offered — the classic COPY-INTO re-ingest-after-retention hazard is
 * closed for any source ingested at least once after its commits (every
 * run refreshes the sidecar). Only deleting the sidecar itself (or never
 * re-running ingest between the commit and the cleanup) reopens it.
 *
 * 100-TB shape: the source listing and skip-diff are driver-side metadata
 * (O(source files) names); the data moves only through one distributed
 * read→write per chunk. Chunking (default 1000 files) bounds the commit
 * JSON and makes multi-TB backfills restartable at chunk granularity.
 */
object Ingest {

  final case class IngestResult(
      filesIngested: Long, rowsIngested: Long,
      filesSkipped: Long, version: Long)

  val Operation = "INGEST"
  private val FilesKey = "ingestFiles"
  private val SourceKey = "source"

  private def fileKey(name: String, size: Long, mtime: Long): String =
    s"$name|$size|$mtime"

  /** Canonical identity of a source dir: the hadoop-Path URI string, so
    * `/path`, `/path/` and `file:/path` all key the same skip-list. */
  private def normalize(sourceDir: String): String =
    new Path(sourceDir).toUri.toString

  private def parseKeys(json: String): Seq[String] =
    JsonMethods.parse(json) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }

  /** Whether `ci` is an INGEST commit for the (normalized) source. Old
    * commits recorded the raw caller string, so match on normalization. */
  private def sameSource(ci: CommitInfo, srcNorm: String): Boolean =
    ci.operation == Operation &&
      ci.operationParameters.get(SourceKey).exists(s => normalize(s) == srcNorm)

  private def censusFile(table: DeltaTable, srcNorm: String): Path = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(srcNorm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    new Path(table.log.logPath, s"_ingest_census.$h.json")
  }

  /** (version, keys) from the source's census sidecar — (-1, empty) when
    * absent or unreadable (it is a cache; degrade to a full replay). The
    * stored source string is verified so a hash collision can never leak
    * another source's keys into this one's skip-list. */
  private def readCensus(table: DeltaTable, srcNorm: String): (Long, Set[String]) =
    try {
      val p = censusFile(table, srcNorm)
      if (!table.log.fs.exists(p)) (-1L, Set.empty)
      else JsonMethods.parse(table.log.readString(p)) match {
        case o: JObject =>
          val src = (o \ "source") match { case JString(s) => s; case _ => "" }
          val v = (o \ "version") match {
            case JInt(n) => n.toLong; case JLong(n) => n; case _ => -1L }
          val keys = (o \ "keys") match {
            case JArray(xs) => xs.collect { case JString(s) => s }.toSet
            case _ => Set.empty[String] }
          if (src == srcNorm && v >= 0) (v, keys) else (-1L, Set.empty)
        case _ => (-1L, Set.empty)
      }
    } catch { case scala.util.control.NonFatal(_) => (-1L, Set.empty) }

  private def writeCensus(table: DeltaTable, srcNorm: String,
                          version: Long, keys: Set[String]): Unit =
    try table.log.writeString(censusFile(table, srcNorm),
      JsonMethods.compact(JsonMethods.render(
        JObject("source" -> JString(srcNorm),
          "version" -> JLong(version),
          "keys" -> JArray(keys.toList.sorted.map(JString(_)))))),
      overwrite = true)
    catch { case scala.util.control.NonFatal(_) => () } // cache — best effort

  /** Rebuild the skip-list for the source: census baseline + a replay of
    * only the commit TAIL above its version, then read-repair the census
    * to the head. O(commits since the last ingest), not O(retained log). */
  private def ingestedKeys(table: DeltaTable, srcNorm: String): Set[String] = {
    val (baseV, baseKeys) = readCensus(table, srcNorm)
    val head = table.log.latestVersion()
    val keys = baseKeys ++ table.log.listCommitVersions().iterator
      .filter(v => v > baseV && v <= head)
      .flatMap { v =>
        table.log.readCommit(v).collectFirst {
          case c: CommitInfo if sameSource(c, srcNorm) =>
            c.operationParameters.get(FilesKey).toSeq.flatMap(parseKeys)
        }.getOrElse(Nil)
      }.toSet
    if (head > baseV) writeCensus(table, srcNorm, head, keys)
    keys
  }

  def run(spark: SparkSession, table: DeltaTable, sourceDir: String,
          format: String = "parquet", chunkFiles: Int = 1000,
          // test seam: invoked with the chunk ordinal just before that
          // chunk's first commit attempt (lets a spec interleave a racing
          // same-source ingest at the exact window the conflict guards)
          beforeChunkCommit: Int => Unit = _ => ()): IngestResult = {
    val src = new Path(sourceDir)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(src)) throw new ValidationException(
      s"ingest source $sourceDir does not exist")
    val srcNorm = normalize(sourceDir)
    val listed = fs.listStatus(src).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    // coveredV: every commit ≤ coveredV is reflected in `seen`; each chunk
    // commit conflict-scans the tail (coveredV, head] for racing ingests.
    var coveredV = table.version
    var seen = ingestedKeys(table, srcNorm)
    def keyOf(s: org.apache.hadoop.fs.FileStatus): String =
      fileKey(s.getPath.getName, s.getLen, s.getModificationTime)
    val (fresh, skipped) = listed.partition(s => !seen(keyOf(s)))
    var skippedN = skipped.size.toLong
    // Keys of every not-yet-committed fresh file — the WHOLE remainder of
    // this loader's work, not just the current chunk. The conflict
    // predicate scans against this union: a racing same-source commit that
    // lands below OUR chunk commit but overlaps only a LATER chunk (the
    // two loaders' listings or chunk boundaries may differ) still aborts,
    // so advancing coveredV past our own commit can never hide it. Scoping
    // the predicate to the current chunk's keys alone had exactly that
    // hole — the later chunk would double-load.
    var remaining: Set[String] = fresh.map(keyOf).toSet

    var files = 0L
    var version = table.version
    val committed = Seq.newBuilder[Long]
    fresh.grouped(chunkFiles).zipWithIndex.foreach { case (chunk0, chunkNo) =>
      var chunk = chunk0
      var done = false
      while (!done) {
        chunk = chunk.filterNot(s => seen(keyOf(s)))
        if (chunk.isEmpty) { done = true }
        else {
          val chunkKeys = chunk.map(keyOf).toSet
          val paths = chunk.map(_.getPath.toString)
          val df = spark.read.format(format).load(paths: _*)
          val keysJson = JsonMethods.compact(JsonMethods.render(
            JArray(chunkKeys.toList.sorted.map(JString(_)))))
          beforeChunkCommit(chunkNo)
          try {
            version = table.write(df, "append", opInfo = Some((Operation, Map(
              SourceKey -> srcNorm,
              FilesKey -> keysJson,
              "format" -> format))),
              tailInfoConflict = Some((coveredV, ci =>
                sameSource(ci, srcNorm) &&
                  ci.operationParameters.get(FilesKey).toSeq
                    .flatMap(parseKeys).exists(remaining))))
            committed += version
            files += chunk.size
            remaining --= chunkKeys
            // Our own commit is the head; everything ≤ it was conflict-
            // scanned against the FULL remainder, so no racer below it can
            // overlap any chunk still to come.
            coveredV = version
            done = true
          } catch {
            case _: IngestConflictException =>
              // A racer loaded overlapping files: fold the new tail into the
              // skip-list and retry this chunk with only the still-fresh part.
              // Version read BEFORE the skip-list rebuild: `seen` must cover
              // at least every commit ≤ coveredV (a racer landing between
              // the two reads ends up in `seen` AND above coveredV — safe;
              // the other order would leave it in neither).
              coveredV = table.version
              seen = ingestedKeys(table, srcNorm)
              remaining = remaining.filterNot(seen)
              skippedN += chunk.count(s => seen(keyOf(s)))
          }
        }
      }
    }
    // Refresh the census through our own commits so the skip-list survives
    // any future log cleanup (the retention closure in the header note).
    if (files > 0) { ingestedKeys(table, srcNorm); () }
    // Exact row count from the WRITTEN commits' footer stats (driver-side
    // metadata, no second data scan). Zero when nothing was fresh.
    val rows = committed.result().flatMap(v => table.log.readCommit(v))
      .collect { case a: AddFile =>
        a.parsedStats.map(_.numRecords).getOrElse(0L) }.sum
    IngestResult(files, rows, skippedN, version)
  }
}
