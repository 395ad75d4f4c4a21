package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

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
 * is rebuilt from driver-side log metadata only.
 *
 * Retention caveat (same class as Delta's own COPY INTO state): the
 * skip-list spans the RETAINED commit history. If log cleanup drops
 * commits older than the retention window, files ingested only in those
 * commits are forgotten and would re-ingest if re-offered; keep ingest
 * sources append-only or retention longer than the re-offer horizon.
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

  /** Rebuild the skip-list for `sourceDir` from the retained log. */
  private def ingestedKeys(table: DeltaTable, sourceDir: String): Set[String] =
    table.log.listCommitVersions().iterator.flatMap { v =>
      table.log.readCommit(v).collectFirst {
        case c: CommitInfo if c.operation == Operation &&
            c.operationParameters.get(SourceKey).contains(sourceDir) =>
          c.operationParameters.get(FilesKey).toSeq.flatMap { json =>
            JsonMethods.parse(json) match {
              case JArray(xs) => xs.collect { case JString(s) => s }
              case _ => Nil
            }
          }
      }.getOrElse(Nil)
    }.toSet

  def run(spark: SparkSession, table: DeltaTable, sourceDir: String,
          format: String = "parquet", chunkFiles: Int = 1000): IngestResult = {
    val src = new Path(sourceDir)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(src)) throw new ValidationException(
      s"ingest source $sourceDir does not exist")
    val listed = fs.listStatus(src).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    val seen = ingestedKeys(table, sourceDir)
    val (fresh, skipped) = listed.partition(s =>
      !seen(fileKey(s.getPath.getName, s.getLen, s.getModificationTime)))

    var files = 0L
    var version = table.version
    val committed = Seq.newBuilder[Long]
    fresh.grouped(chunkFiles).foreach { chunk =>
      val paths = chunk.map(_.getPath.toString)
      val df = spark.read.format(format).load(paths: _*)
      val keys: JValue = JArray(chunk.toList.map(s =>
        JString(fileKey(s.getPath.getName, s.getLen, s.getModificationTime))))
      version = table.write(df, "append", opInfo = Some((Operation, Map(
        SourceKey -> sourceDir,
        FilesKey -> JsonMethods.compact(JsonMethods.render(keys)),
        "format" -> format))))
      committed += version
      files += chunk.size
    }
    // Exact row count from the WRITTEN commits' footer stats (driver-side
    // metadata, no second data scan). Zero when nothing was fresh.
    val rows = committed.result().flatMap(v => table.log.readCommit(v))
      .collect { case a: AddFile =>
        a.parsedStats.map(_.numRecords).getOrElse(0L) }.sum
    IngestResult(files, rows, skipped.size.toLong, version)
  }
}
