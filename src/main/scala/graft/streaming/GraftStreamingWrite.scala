package graft.streaming

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graftshim.WriteShim
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.delta.{AddFile, DeltaTable, PartitionPaths, Txn, ValidationException}

/**
 * DSv2 streaming sink behind `df.writeStream.toTable("graft.ns.t")` — the
 * catalog twin of the `format("graft-delta")` V1 sink, with the SAME
 * exactly-once contract (every epoch's commit carries `Txn(queryId,
 * epochId)`; replays are detected and dropped — see
 * [[DeltaTable.commitStreamedFiles]]) but a fundamentally more scalable
 * write path: EXECUTORS write parquet directly into the table's final
 * layout through Spark's own parquet `OutputWriter` (per-partition-value
 * writers, Hive-escaped directories, physical column names under column
 * mapping), and only (path, size) metadata flows to the driver's commit.
 * No per-batch driver-side re-write, no staging move — at ingest scale
 * the bytes are written exactly once.
 *
 * Append mode appends; Complete mode overwrite-commits each epoch.
 * Refused up front (clear errors, at query START not mid-stream): CHECK
 * constraints (not enforceable task-side yet — use foreachBatch), query
 * columns missing from the table, and type mismatches. Columns the query
 * omits land as sparse files (read back as NULL — the table's ordinary
 * sparse-append semantics).
 */
final class GraftStreamingWrite(
    spark: SparkSession,
    tablePath: String,
    queryId: String,
    querySchema: StructType,
    truncate: Boolean) extends StreamingWrite {

  private val table = DeltaTable.forPath(spark, tablePath)
  private val snap = table.metaSnapshot()
  if (snap.metadata.isEmpty) throw new ValidationException(
    s"cannot stream into $tablePath before its schema exists")
  if (table.checkConstraints(snap).nonEmpty) throw new ValidationException(
    "streaming writes do not enforce CHECK constraints yet; " +
      "stream through foreachBatch + write() instead")
  private val tableSchema = snap.schema
  private val partCols: Seq[String] = snap.partitionColumns

  querySchema.fields.foreach { qf =>
    tableSchema.fields.find(_.name == qf.name) match {
      case None => throw new ValidationException(
        s"streaming column '${qf.name}' does not exist in the table " +
          "(streaming writes do not evolve the schema)")
      case Some(tf) if tf.dataType != qf.dataType =>
        throw new ValidationException(
          s"streaming column '${qf.name}' has type ${qf.dataType.sql}, " +
            s"table expects ${tf.dataType.sql}")
      case _ => ()
    }
  }
  partCols.filterNot(querySchema.fieldNames.contains).headOption.foreach(p =>
    throw new ValidationException(
      s"streaming into a partitioned table requires partition column '$p'"))

  /** Physical file schema: table data columns (minus partition columns,
    * physical names) the QUERY actually carries — omitted columns stay
    * omitted (sparse files), matching the batch writer. */
  private val physical = table.physicalSchema(tableSchema).getOrElse(tableSchema)
  private val filePlan: Array[(org.apache.spark.sql.types.StructField, Int)] =
    tableSchema.fields.zip(physical.fields).collect {
      case (lf, pf) if !partCols.contains(lf.name) &&
          querySchema.fieldNames.contains(lf.name) =>
        (pf.copy(name = pf.name), querySchema.fieldIndex(lf.name))
    }
  private val fileSchema = StructType(filePlan.map(_._1))
  private val partIdx: Array[Int] = partCols.toArray.map(querySchema.fieldIndex)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (factory, conf) = WriteShim.parquetWriterFactory(spark, fileSchema)
    GraftStreamWriterFactory(tablePath, fileSchema,
      filePlan.map(_._2), querySchema, partCols.toArray, partIdx,
      factory, conf)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val now = System.currentTimeMillis()
    val raw = messages.collect { case m: GraftStreamCommitMessage => m.files }
      .flatten.map { case (rel, size) =>
        AddFile(rel, PartitionPaths.parse(rel), size, now)
      }
    table.commitStreamedFiles(raw.toIndexedSeq, Txn(queryId, epochId, now),
      overwrite = truncate)
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: GraftStreamCommitMessage =>
        m.files.foreach { case (rel, _) => table.deleteDataFile(rel) }
      case _ => ()
    }

  override def toString: String = s"GraftStreamingWrite[$tablePath]"
}

/** Per-(file-relative-path, bytes) written by one task. */
final case class GraftStreamCommitMessage(files: Seq[(String, Long)])
  extends WriterCommitMessage

/** Serializable task-writer factory: everything a task needs to route
  * rows to per-partition parquet writers in the table's final layout. */
final case class GraftStreamWriterFactory(
    tablePath: String,
    fileSchema: StructType,
    dataIdx: Array[Int],
    querySchema: StructType,
    partCols: Array[String],
    partIdx: Array[Int],
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(this, partitionId, taskId, epochId)
}

/**
 * Task-side writer: projects each row to the file schema (by the
 * driver-computed ordinals), renders its partition directory
 * (Hive-escaped, `__HIVE_DEFAULT_PARTITION__` for null), and appends to
 * that partition's open parquet writer — one writer per partition value
 * per task, the same shape Spark's own dynamic-partition writer produces.
 */
private final class GraftStreamDataWriter(
    f: GraftStreamWriterFactory,
    partitionId: Int, taskId: Long, epochId: Long)
  extends DataWriter[InternalRow] {

  private val queryTypes = f.querySchema.fields.map(_.dataType)
  private val dataProj = UnsafeProjection.create(
    f.fileSchema.fields.toIndexedSeq.zip(f.dataIdx.toIndexedSeq).map {
      case (sf, i) =>
        if (i >= 0) BoundReference(i, queryTypes(i), nullable = true)
        else Literal(null, sf.dataType)
    })
  // partition values render through Cast-to-string (UTC) — the same
  // rendering Spark's writer uses, so paths parse back identically
  private val partProj =
    if (f.partIdx.isEmpty) null
    else UnsafeProjection.create(f.partIdx.toIndexedSeq.map(i =>
      Cast(BoundReference(i, queryTypes(i), nullable = true), StringType,
        Some("UTC"))))

  private val ext = WriteShim.fileExtension(f.factory, f.conf.value, taskId)
  private val writers = mutable.LinkedHashMap.empty[
    String, (org.apache.spark.sql.execution.datasources.OutputWriter, String)]
  private var fileNo = 0

  private def dirFor(row: InternalRow): String = {
    if (f.partIdx.isEmpty) return ""
    val rendered = partProj(row)
    f.partCols.zipWithIndex.map { case (c, i) =>
      val v =
        if (rendered.isNullAt(i)) PartitionPaths.NullMarker
        else WriteShim.escapePathName(rendered.getUTF8String(i).toString)
      s"${WriteShim.escapePathName(c)}=$v"
    }.mkString("", "/", "/")
  }

  override def write(row: InternalRow): Unit = {
    val dir = dirFor(row)
    val (w, _) = writers.getOrElseUpdate(dir, {
      val rel = f"${dir}part-$epochId%05d-$partitionId%05d-$taskId-$fileNo$ext"
      fileNo += 1
      val abs = new Path(f.tablePath, rel).toString
      (WriteShim.newWriter(f.factory, abs, f.fileSchema, f.conf.value, taskId), rel)
    })
    w.write(dataProj(row))
  }

  override def commit(): WriterCommitMessage = {
    val fs = new Path(f.tablePath).getFileSystem(f.conf.value)
    val files = writers.values.toSeq.map { case (w, rel) =>
      w.close()
      rel -> fs.getFileStatus(new Path(f.tablePath, rel)).getLen
    }
    writers.clear()
    GraftStreamCommitMessage(files)
  }

  override def abort(): Unit = {
    val fs = new Path(f.tablePath).getFileSystem(f.conf.value)
    writers.values.foreach { case (w, rel) =>
      try w.close() catch { case _: Throwable => () }
      try fs.delete(new Path(f.tablePath, rel), false) catch { case _: Throwable => () }
    }
    writers.clear()
  }

  override def close(): Unit =
    writers.values.foreach { case (w, _) =>
      try w.close() catch { case _: Throwable => () }
    }
}
