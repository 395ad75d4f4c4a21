package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Bridge to Spark's internal file-scan machinery (`private[sql]` /
 * `private[spark]` seams — Delta Lake and Iceberg ship the same shims).
 * Lives under `org.apache.spark.sql` ONLY to satisfy the access
 * qualifiers; it contains no Spark code.
 */
object ScanShim {

  /**
   * A parquet [[PartitionReaderFactory]] built by Spark's OWN
   * `ParquetScan.createReaderFactory` — every session read semantic
   * (vectorized reader, timestamp units/rebase modes, case sensitivity,
   * off-heap buffers) is configured exactly as Spark's native parquet
   * source configures it, so a custom `Batch` only has to PLAN partitions.
   * The factory is serializable and creates readers task-side. The file
   * index argument is planning-only and unused by factory construction,
   * so an empty one is passed.
   */
  def parquetReaderFactory(spark: SparkSession,
                           dataSchema: StructType,
                           readDataSchema: StructType,
                           partitionSchema: StructType,
                           pushedFilters: Array[Filter]): PartitionReaderFactory = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val hadoopConf = cs.sessionState.newHadoopConfWithOptions(Map.empty)
    val emptyIndex = new InMemoryFileIndex(cs, Nil, Map.empty, None)
    ParquetScan(cs, hadoopConf, emptyIndex, dataSchema, readDataSchema,
      partitionSchema, pushedFilters, CaseInsensitiveStringMap.empty(),
      None, Nil, Nil, Array.empty).createReaderFactory()
  }

  /** One file slice of a [[FilePartition]]. `partitionValues` must match
    * the factory's partitionSchema positionally (internal representations:
    * UTF8String for strings, etc.). */
  def partitionedFile(partitionValues: InternalRow, path: Path,
                      start: Long, length: Long, fileSize: Long,
                      modificationTime: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPath(path), start, length,
      Array.empty, modificationTime, fileSize)

  /** Bin-pack file slices into read partitions with Spark's own packer
    * (largest-first, respecting `maxSplitBytes` + open cost). */
  def filePartitions(spark: SparkSession, files: Seq[PartitionedFile],
                     maxSplitBytes: Long): Seq[FilePartition] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    FilePartition.getFilePartitions(cs, files, maxSplitBytes)
  }

  /** Spark's split-size formula (`FilePartition.maxSplitBytes` needs
    * `PartitionDirectory`s; same arithmetic over plain byte sizes):
    * min(maxPartitionBytes, max(openCost, totalBytes/minPartitionNum)). */
  def maxSplitBytes(spark: SparkSession, fileBytes: Seq[Long]): Long = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val conf = cs.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val minPartitionNum = conf.filesMinPartitionNum
      .getOrElse(cs.sparkContext.defaultParallelism)
    val totalBytes = fileBytes.map(_ + openCost).sum
    val bytesPerCore = totalBytes / math.max(minPartitionNum, 1)
    Math.min(conf.filesMaxPartitionBytes, Math.max(openCost, bytesPerCore))
  }

  /** V2 runtime-filter `Predicate` → V1 `Filter` (None when the predicate
    * has no V1 form; the caller prunes with what translates). */
  def toV1Filter(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
