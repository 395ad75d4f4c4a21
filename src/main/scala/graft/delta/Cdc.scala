package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Change data feed: per-commit Parquet under `<table>/_change_data/` with the
 * Delta CDF columns `_change_type / _commit_version / _commit_timestamp`
 * (reference: src/cdc/index.ts:105-128,1592-1654,2319-2359).
 *
 * Files land both at the direct path `cdc-<20-digit-version>.parquet` and
 * under a `date=YYYY-MM-DD/` partition, mirroring the reference's dual
 * layout (src/cdc/index.ts:2336-2348). Each "file" is a Spark-written
 * parquet directory — executors write it, so capture scales with the data.
 *
 * The reference's CDC-enabled update/delete emit change rows without
 * applying the change (src/cdc/index.ts:1830-1916, a documented quirk); here
 * capture hangs off the real DML paths, so the table and its feed agree.
 */
object Cdc {

  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"
  val CommitTimestamp = "_commit_timestamp"
  val EnableKey = "delta.enableChangeDataFeed"

  def changeDataDir(tablePath: Path) = new Path(tablePath, "_change_data")

  def cdcFileName(version: Long): String = f"cdc-$version%020d.parquet"

  /** Write change rows (`df` = data columns + `_change_type`) for `version`. */
  def writeChanges(table: DeltaTable, version: Long, df: DataFrame,
                   timestampMs: Long): Unit = Logging.withJobDesc(
      table.spark, "graft:cdc-write") {
    val stamped = df
      .withColumn(CommitVersion, lit(version))
      .withColumn(CommitTimestamp,
        timestamp_millis(lit(timestampMs)))
    val dir = changeDataDir(table.tablePath)
    val direct = new Path(dir, cdcFileName(version))
    stamped.write.mode("overwrite").parquet(direct.toString)
    // Dual date-partitioned layout (date=YYYY-MM-DD/cdc-<v>.parquet): a
    // distributed BYTE copy of the files just written — re-running
    // `stamped.write` would recompute the whole change-derivation plan
    // (often a join against the pre-image snapshot) a second time.
    val date = java.time.LocalDate.ofInstant(
      java.time.Instant.ofEpochMilli(timestampMs), java.time.ZoneOffset.UTC)
    val dated = new Path(dir, s"date=$date/${cdcFileName(version)}")
    mirrorDir(table, direct, dated)
  }

  /** Copy every file under `src` to `dst` as one Spark job (scales with
    * executors; no driver byte traffic). */
  private def mirrorDir(table: DeltaTable, src: Path, dst: Path): Unit = {
    val fs = table.log.fs
    fs.delete(dst, true)
    fs.mkdirs(dst)
    val statuses = fs.listStatus(src).filter(_.isFile)
    val files = statuses
      .map(st => (st.getPath.toString, new Path(dst, st.getPath.getName).toString))
    // Small mirrors copy on the driver: a Spark job + task launch per CDC
    // commit costs more than streaming a few MB through the driver. The
    // byte bound (not a file-count bound) keeps big change feeds on the
    // distributed path — no unbounded driver byte traffic.
    if (statuses.map(_.getLen).sum <= 16L * 1024 * 1024) {
      val conf = table.log.hadoopConf
      files.foreach { case (from, to) =>
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new Path(from), fs, new Path(to),
          /*deleteSource=*/ false, /*overwrite=*/ true, conf)
      }
      return
    }
    val confItems: Seq[(String, String)] = {
      val it = table.log.hadoopConf.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    table.spark.sparkContext
      .parallelize(files.toSeq, math.max(1, math.min(files.length, 32)))
      .foreach { case (from, to) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confItems.foreach { case (k, v) => conf.set(k, v) }
        val sfs = new Path(from).getFileSystem(conf)
        val dfs = new Path(to).getFileSystem(conf)
        org.apache.hadoop.fs.FileUtil.copy(
          sfs, new Path(from), dfs, new Path(to),
          /*deleteSource=*/ false, /*overwrite=*/ true, conf)
        ()
      }
  }

  private def listVersions(table: DeltaTable): Seq[(Long, Path)] =
    Retry.withRetry(retryOn = Errors.isTransientIo) {
      val dir = changeDataDir(table.tablePath)
      if (!table.log.fs.exists(dir)) Nil
      else {
        val Re = raw"cdc-(\d{20})\.(parquet|json)".r
        table.log.fs.listStatus(dir).iterator.flatMap { st =>
          st.getPath.getName match {
            case Re(v, _) => Some(v.toLong -> st.getPath)
            case _ => None
          }
        }.toSeq.sortBy(_._1)
      }
    }

  /** Content sniffing, like the reference (cdc/index.ts:1462-1558): a CDC
    * entry is Parquet iff it is a Spark-written directory or starts with the
    * PAR1 magic; anything else is parsed as (ND)JSON for interop with feeds
    * written by other tools. */
  private def isParquet(table: DeltaTable, p: Path): Boolean = {
    val fs = table.log.fs
    fs.getFileStatus(p).isDirectory || {
      val in = fs.open(p)
      try {
        val b = new Array[Byte](4)
        in.readFully(b)
        java.util.Arrays.equals(b, "PAR1".getBytes("US-ASCII"))
      } catch { case _: java.io.IOException => false }
      finally in.close()
    }
  }

  private def readFiles(table: DeltaTable, files: Seq[Path]): DataFrame = {
    val spark = table.spark
    val (pq, js) = files.partition(isParquet(table, _))
    val jsonDf = if (js.isEmpty) None else Some {
      var df = spark.read.json(js.map(_.toString): _*)
      // JSON carries no types: restore the CDF column types for the union.
      if (df.columns.contains(CommitVersion))
        df = df.withColumn(CommitVersion, col(CommitVersion).cast("long"))
      if (df.columns.contains(CommitTimestamp))
        df = df.withColumn(CommitTimestamp, to_timestamp(col(CommitTimestamp)))
      df
    }
    val pqDf = if (pq.isEmpty) None else Some(spark.read.parquet(pq.map(_.toString): _*))
    (pqDf.toSeq ++ jsonDf.toSeq)
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Changes for versions in [start, end] (reference: cdc/index.ts:1244-1254). */
  def readByVersion(table: DeltaTable, start: Long, end: Long): DataFrame = {
    val files = listVersions(table)
      .filter { case (v, _) => v >= start && v <= end }.map(_._2)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"no CDC data in version range [$start,$end]")
    readFiles(table, files)
  }

  /** Changes with commit timestamp in [startMs, endMs], ascending
    * (reference: cdc/index.ts:1259-1270). */
  def readByTimestamp(table: DeltaTable, startMs: Long, endMs: Long): DataFrame = {
    val files = listVersions(table).map(_._2)
    if (files.isEmpty)
      throw new IllegalArgumentException("no CDC data")
    readFiles(table, files)
      .filter(col(CommitTimestamp) >= timestamp_millis(lit(startMs)) &&
        col(CommitTimestamp) <= timestamp_millis(lit(endMs)))
      .orderBy(col(CommitTimestamp))
  }
}

/** Kafka-style offset tracking for CDC consumption
  * (reference: CDCConsumer, src/cdc/index.ts:607-1204; OffsetStorage 465-596).
  * Offsets are committed versions: position = last consumed version + 1. */
trait OffsetStorage {
  def read(group: String): Option[Long]
  def write(group: String, version: Long): Unit
}

final class InMemoryOffsetStorage extends OffsetStorage {
  private val m = scala.collection.concurrent.TrieMap.empty[String, Long]
  def read(group: String): Option[Long] = m.get(group)
  def write(group: String, version: Long): Unit = m.put(group, version)
}

/** Offsets in a small JSON file next to the table (driver-side state). */
final class FileOffsetStorage(log: DeltaLog) extends OffsetStorage {
  private def p(group: String) =
    new Path(log.tablePath, s"_cdc_offsets/$group.json")
  def read(group: String): Option[Long] =
    if (!log.fs.exists(p(group))) None
    else scala.util.Try {
      val j = org.json4s.jackson.JsonMethods.parse(log.readString(p(group)))
      (j \ "version") match {
        case org.json4s.JInt(n) => n.toLong
        case org.json4s.JLong(n) => n
        case _ => -1L
      }
    }.toOption.filter(_ >= 0)
  def write(group: String, version: Long): Unit = {
    log.fs.mkdirs(p(group).getParent)
    log.writeString(p(group), s"""{"version":$version}""", overwrite = true)
  }
}

/** Pull-based consumer: `poll()` returns all changes after the committed
  * offset; `commit()` advances it. */
final class CdcConsumer(table: DeltaTable, storage: OffsetStorage, group: String) {
  private var lastPolled: Option[Long] = None

  def position: Long = storage.read(group).map(_ + 1).getOrElse(0L)

  def poll(): Option[DataFrame] = {
    val from = position
    val latest = table.version
    if (latest < from) return None
    try {
      val df = Cdc.readByVersion(table, from, latest)
      lastPolled = Some(latest)
      Some(df)
    } catch {
      // ONLY the expected no-data case (commits in range wrote no CDC files,
      // e.g. metadata-only commits) is "nothing new"; a corrupt or unreadable
      // CDC file must surface, not masquerade as an empty poll — the round-2
      // Try(...).toOption made the two indistinguishable.
      case _: IllegalArgumentException =>
        lastPolled = Some(latest) // commit() may advance past the empty range
        None
    }
  }

  def commit(): Unit = lastPolled.foreach(v => storage.write(group, v))

  def reset(toVersion: Long): Unit = {
    storage.write(group, toVersion - 1)
    lastPolled = None
  }
}
