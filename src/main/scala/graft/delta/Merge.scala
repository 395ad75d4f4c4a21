package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * MERGE (upsert) support, the classic Spark implementation of the
 * reference's row-at-a-time merge (reference: CDCDeltaTable.merge,
 * src/cdc/index.ts:1937-2005): instead of an O(N·M) nested loop over JS
 * closures, the match is a key-equality join and the resolution is a
 * `when/otherwise` projection — fully distributed, and only the target files
 * that actually contain matches are rewritten (copy-on-write).
 *
 * Semantics notes:
 *  - the reference resolves each incoming row against the FIRST matching
 *    existing row; with key-based matching we realize that as
 *    `dropDuplicates(keys)` on the source (first occurrence wins);
 *  - `whenMatched → null` means delete (src/cdc/index.ts:1958-1966) →
 *    [[MergeAction.Delete]];
 *  - `whenNotMatched → null` means skip → `insertUnmatched = false`;
 *  - the reference's CDC table variant emits change rows but forgets to apply
 *    them (src/cdc/index.ts:1830-1916) — we implement the intended semantics.
 */
object Merge {

  sealed trait MergeAction
  object MergeAction {
    /** Matched target rows are replaced wholesale by the source row. */
    case object UpdateAll extends MergeAction
    /** Matched target rows get the given columns overwritten (expressions
      * may reference target columns and `source.<col>` via `src_` prefix). */
    final case class UpdateSet(set: Map[String, Column]) extends MergeAction
    /** Matched target rows are deleted. */
    case object Delete extends MergeAction
  }

  final case class MergeResult(updated: Long, deleted: Long, inserted: Long, version: Long)

  def execute(table: DeltaTable, source: DataFrame, keyColumns: Seq[String],
              matched: MergeAction, insertUnmatched: Boolean): MergeResult = {
    require(keyColumns.nonEmpty, "merge requires at least one key column")
    val spark = table.spark
    val snap = table.snapshot()
    val schema = snap.schema
    val dataCols = schema.fieldNames.toSeq
    require(keyColumns.forall(dataCols.contains), s"keys must exist in table: $keyColumns")

    // First-match semantics: one source row per key.
    val src = source.dropDuplicates(keyColumns)
    // Source rows carried as one struct column to dodge name collisions.
    val srcCols = src.columns.toSeq
    val packed = src.select(
      struct(srcCols.map(col): _*).as("__src") +: keyColumns.map(k => col(k).as(s"__k_$k")): _*)

    val target = table.toDF(snap).withColumn("__file", col("_metadata.file_path"))
    val joinCond = keyColumns.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)

    // Which target files contain matches (these are the only ones rewritten)
    // and how many rows matched — ONE pass over the target⟕source join
    // instead of a distinct-collect plus a separate count.
    val joined = target.join(packed, joinCond, "left_outer")
    val matchAgg = joined.filter(col("__src").isNotNull)
      .agg(count(lit(1)).as("n"), collect_set(col("__file")).as("files")).head()
    val nMatched = matchAgg.getLong(0)
    val matchedFiles = matchAgg.getSeq[String](1)

    val (updated, deleted) =
      if (matchedFiles.isEmpty) (0L, 0L)
      else {
        val inFiles = joined.filter(col("__file").isin(matchedFiles: _*))
        val rewritten: DataFrame = matched match {
          case MergeAction.UpdateAll =>
            val cols = dataCols.map { c =>
              if (srcCols.contains(c))
                when(col("__src").isNotNull, col(s"__src.$c")).otherwise(col(c)).as(c)
              else col(c)
            }
            inFiles.select(cols: _*)
          case MergeAction.UpdateSet(set) =>
            val cols = dataCols.map { c =>
              set.get(c) match {
                case Some(e) => when(col("__src").isNotNull, e).otherwise(col(c)).as(c)
                case None => col(c)
              }
            }
            inFiles.select(cols: _*)
          case MergeAction.Delete =>
            inFiles.filter(col("__src").isNull).select(dataCols.map(col): _*)
        }
        val dels = if (matched == MergeAction.Delete) nMatched else 0L
        val upds = if (matched == MergeAction.Delete) 0L else nMatched
        rewriteAndTrack(table, snap, matchedFiles, rewritten)
        (upds, dels)
      }

    // Inserts: source rows with no key match in the WHOLE target. Written
    // directly; the count comes from the files' own numRecords stats, so the
    // anti-join is evaluated once (no separate count job over the target).
    val inserted =
      if (!insertUnmatched) 0L
      else {
        val targetKeys = table.toDF(snap).select(keyColumns.map(col): _*).distinct()
        val newRows = src.join(targetKeys, keyColumns, "left_anti")
        // Align to table schema: missing columns null, present ones cast.
        val aligned = newRows.select(schema.fields.map { f =>
          if (srcCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
        val adds = table.writeDataFiles(aligned, snap.partitionColumns, schema)
        val counted = adds.map(a =>
          a -> a.stats.flatMap(FileStats.fromJsonString).map(_.numRecords).getOrElse(0L))
        val nonEmpty = counted.filter(_._2 > 0)
        if (nonEmpty.nonEmpty) table.appendCommit(nonEmpty.map(_._1), "MERGE-INSERT")
        // drop any zero-row part files the writer produced
        counted.filterNot(_._2 > 0).foreach(a => table.deleteDataFile(a._1.path))
        nonEmpty.map(_._2).sum
      }
    MergeResult(updated, deleted, inserted, table.version)
  }

  private def rewriteAndTrack(table: DeltaTable, snap: Snapshot,
                              matchedFiles: Seq[String], rewritten: DataFrame): Unit = {
    val adds = table.writeDataFiles(rewritten.drop("__file"),
      snap.partitionColumns, snap.schema)
    table.commitFileRewrite(snap, matchedFiles.toSet, adds, "MERGE")
  }

  /**
   * Closure-based merge, the reference's `whenMatched`/`whenNotMatched`
   * row functions (src/cdc/index.ts:1937-2005) on a distributed engine:
   * matching stays a KEY-EQUALITY join (the reference's arbitrary
   * `matchCondition` closure would force an all-pairs pass — key join is the
   * scalable subset), but the per-row resolution is an arbitrary Scala
   * function. `whenMatched(existing, incoming)` returns the replacement row
   * or None to delete; `whenNotMatched(incoming)` returns the row to insert
   * (shaped to the TABLE schema) or None to skip. Closures run on executors
   * over the joined rows — no driver materialization.
   */
  def executeWith(table: DeltaTable, source: DataFrame, keyColumns: Seq[String])
                 (whenMatched: (org.apache.spark.sql.Row, org.apache.spark.sql.Row) =>
                    Option[org.apache.spark.sql.Row],
                  whenNotMatched: org.apache.spark.sql.Row =>
                    Option[org.apache.spark.sql.Row]): MergeResult = {
    import org.apache.spark.sql.{Encoders, Row}
    require(keyColumns.nonEmpty, "merge requires at least one key column")
    val snap = table.snapshot()
    val schema = snap.schema
    val dataCols = schema.fieldNames.toSeq
    require(keyColumns.forall(dataCols.contains), s"keys must exist in table: $keyColumns")

    val src = source.dropDuplicates(keyColumns)
    val srcCols = src.columns.toSeq
    val packed = src.select(
      struct(srcCols.map(col): _*).as("__src") +: keyColumns.map(k => col(k).as(s"__k_$k")): _*)
    val target = table.toDF(snap).withColumn("__file", col("_metadata.file_path"))
    val joinCond = keyColumns.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    val joined = target.join(packed, joinCond, "left_outer")
    val matchAgg = joined.filter(col("__src").isNotNull)
      .agg(count(lit(1)).as("n"), collect_set(col("__file")).as("files")).head()
    val nMatched = matchAgg.getLong(0)
    val matchedFiles = matchAgg.getSeq[String](1)

    val kept = table.spark.sparkContext.longAccumulator("graft.merge.kept")
    val (updated, deleted) =
      if (matchedFiles.isEmpty) (0L, 0L)
      else {
        val inFiles = joined.filter(col("__file").isin(matchedFiles: _*))
        val nData = dataCols.size
        val srcIdx = inFiles.columns.indexOf("__src")
        val rewritten = inFiles.flatMap { row =>
          val existing = Row.fromSeq((0 until nData).map(row.get))
          if (row.isNullAt(srcIdx)) Some(existing) // unmatched row in the file: keep
          else {
            val out = whenMatched(existing, row.getStruct(srcIdx))
            if (out.isDefined) kept.add(1L)
            out
          }
        }(Encoders.row(schema))
        val adds = table.writeDataFiles(rewritten.toDF(),
          snap.partitionColumns, snap.schema)
        table.commitFileRewrite(snap, matchedFiles.toSet, adds, "MERGE")
        (kept.value.longValue(), nMatched - kept.value.longValue())
      }

    val inserts = {
      val targetKeys = table.toDF(snap).select(keyColumns.map(col): _*).distinct()
      val newRows = src.join(targetKeys, keyColumns, "left_anti")
      val shaped = newRows.flatMap(r => whenNotMatched(r))(Encoders.row(schema))
      val adds = table.writeDataFiles(shaped.toDF(), snap.partitionColumns, schema)
      val counted = adds.map(a =>
        a -> a.stats.flatMap(FileStats.fromJsonString).map(_.numRecords).getOrElse(0L))
      val nonEmpty = counted.filter(_._2 > 0)
      if (nonEmpty.nonEmpty) table.appendCommit(nonEmpty.map(_._1), "MERGE-INSERT")
      counted.filterNot(_._2 > 0).foreach(a => table.deleteDataFile(a._1.path))
      nonEmpty.map(_._2).sum
    }
    MergeResult(updated, deleted, inserts, table.version)
  }
}
