package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * Bridge to Spark's internal file-WRITE machinery for task-side parquet
 * writing (the DSv2 streaming sink needs a per-task writer; Spark's own
 * `FileFormatWriter` is driver-orchestrated). Same access-qualifier story
 * as [[ScanShim]].
 */
object WriteShim {

  /** A serializable parquet [[OutputWriterFactory]] plus the Hadoop conf
    * `prepareWrite` configured (compression codec, write support class,
    * schema, timestamp units — the conf MUST travel with the factory: the
    * writer reads its settings from the task attempt context). */
  def parquetWriterFactory(spark: SparkSession, dataSchema: StructType)
      : (OutputWriterFactory, SerializableConfiguration) = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = Job.getInstance(cs.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(cs, job, Map.empty, dataSchema)
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  def fileExtension(factory: OutputWriterFactory, conf: Configuration,
                    taskId: Long): String =
    factory.getFileExtension(taskContext(conf, taskId))

  def newWriter(factory: OutputWriterFactory, path: String,
                dataSchema: StructType, conf: Configuration,
                taskId: Long): OutputWriter =
    factory.newInstance(path, dataSchema, taskContext(conf, taskId))

  private def taskContext(conf: Configuration, taskId: Long) =
    new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID("graft-stream", 0),
        TaskType.MAP, (taskId % Int.MaxValue).toInt), 0))

  /** Hive-layout path escaping — byte-identical to what Spark's own
    * partitioned writer produces, so `PartitionPaths.parse` round-trips. */
  def escapePathName(s: String): String =
    ExternalCatalogUtils.escapePathName(s)
}
