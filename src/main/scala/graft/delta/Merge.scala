package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** One `WHEN MATCHED [AND condition] THEN action` clause. Conditions are
    * evaluated in the matched-row environment: target columns by name,
    * source columns through the carried `__src` struct
    * (`col("__src.<name>")`). */
  final case class MergeClause(condition: Option[Column], action: MergeAction)

  /** One `WHEN NOT MATCHED [AND condition] THEN INSERT …` clause.
    * Conditions are over plain SOURCE column names. `values = None` is
    * `INSERT *` (every same-named source column, others null);
    * `values = Some(map)` is `INSERT (cols) VALUES (exprs)` — per-target-
    * column expressions over source names, and target columns ABSENT from
    * the map become NULL (SQL column-list semantics). Multiple clauses are
    * tried in order, first-true-wins, like the matched side. */
  final case class InsertClause(condition: Option[Column],
                                values: Option[Map[String, Column]] = None)

  def execute(table: DeltaTable, source: DataFrame, keyColumns: Seq[String],
              matched: MergeAction, insertUnmatched: Boolean): MergeResult =
    executeClauses(table, source, keyColumns.map(k => (k, k)),
      Seq(MergeClause(None, matched)),
      if (insertUnmatched) Seq(InsertClause(None)) else Nil)

  /**
   * Key-equality MERGE with SQL's full matched-clause list: clauses are
   * tried IN ORDER per matched row, the first whose condition is true
   * applies, and a matched row satisfying no clause is left untouched
   * (its file is not even rewritten unless another row in it matched a
   * clause). Keys are (targetColumn, sourceColumn) PAIRS — the two sides
   * need not share names (`ON t.o_orderkey = s.src_key`). `inserts` is
   * the ordered `WHEN NOT MATCHED` clause list (see [[InsertClause]]),
   * also first-true-wins. `notMatchedBySource` clauses apply to TARGET
   * rows with no source match (conditions/assignments over target columns
   * only; `UpdateAll` is meaningless there and refused) — note the scale
   * asymmetry: matched clauses rewrite only files containing matches,
   * while an unconditional not-matched-by-source clause can touch every
   * file (inherent to the operation — it reads "sync the whole table to
   * the source").
   *
   * `sqlSemantics = false` (programmatic API, reference parity): the
   * source is key-deduped first-occurrence-wins and keys join null-SAFE
   * (`<=>`). `sqlSemantics = true` (the SQL front door): no silent dedup —
   * multiple source rows matching one target row raise a MERGE
   * cardinality violation, duplicate UNMATCHED source rows all insert,
   * and keys join with plain `=` (a null-key source row matches nothing
   * and inserts; a null-key target row is NOT MATCHED BY SOURCE).
   */
  def executeClauses(table: DeltaTable, source: DataFrame,
                     keyPairs: Seq[(String, String)],
                     matchedClauses: Seq[MergeClause],
                     inserts: Seq[InsertClause],
                     notMatchedBySource: Seq[MergeClause] = Nil,
                     sqlSemantics: Boolean = false,
                     // by-name TARGET key override: key `tk` joins on this
                     // expression instead of `col(tk)` — lets a caller key
                     // a non-joinable column (a map) on a derived encoding
                     // while the source side carries the same encoding
                     tgtKeyExpr: Map[String, Column] = Map.empty): MergeResult = {
    require(notMatchedBySource.forall(_.action != MergeAction.UpdateAll),
      "NOT MATCHED BY SOURCE cannot UPDATE SET * (no source row to copy)")
    require(keyPairs.nonEmpty, "merge requires at least one key column")
    val spark = table.spark
    val snap = table.snapshot()
    val schema = snap.schema
    refuseGeneratedAssignments(schema, matchedClauses ++ notMatchedBySource)
    val dataCols = schema.fieldNames.toSeq
    val tgtKeys = keyPairs.map(_._1)
    val srcKeys = keyPairs.map(_._2)
    require(tgtKeys.forall(dataCols.contains), s"keys must exist in table: $tgtKeys")
    require(srcKeys.forall(source.columns.contains),
      s"keys must exist in source: $srcKeys")
    def keyEq(l: Column, r: Column): Column = if (sqlSemantics) l === r else l <=> r

    // First-match semantics (programmatic API): one source row per key.
    // SQL keeps every source row and errors on ambiguous matches below.
    // The source feeds up to five passes (cardinality check, census join,
    // rewrite join, insert anti-join, CDC parts): persist it once —
    // MEMORY_AND_DISK so a huge change set spills instead of OOMing — and
    // drop the blocks when the merge completes, so each pass reads the
    // materialized rows instead of re-evaluating the whole source plan
    // (Delta's own MERGE materializes the source for the same reason).
    val src = (if (sqlSemantics) source else source.dropDuplicates(srcKeys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Source rows carried as one struct column to dodge name collisions.
    val srcCols = src.columns.toSeq
    // `return` below returns from THIS nested method, so the persist above
    // is released on every exit path (including thrown validation errors).
    def body(): MergeResult = {

    val insertUnmatched = inserts.nonEmpty

    // Identity columns: insert images get values allocated from the
    // high-water mark (Delta's MERGE INSERT behavior); the commit
    // re-checks the mark in its OCC loop and advances it.
    val idSpecs = IdentityColumns.specs(schema)
    def allocInserts(df: DataFrame): (DataFrame, () => Unit) =
      if (idSpecs.isEmpty) (df, () => ())
      else IdentityColumns.assign(spark, df, idSpecs)

    // Empty active set: `_metadata` cannot resolve on the empty relation
    // toDF returns, and semantically every source row is an insert.
    if (snap.activeFiles.isEmpty) {
      val inserted =
        if (!insertUnmatched) 0L
        else {
          val (a, rel) = allocInserts(buildInserts(src, inserts, schema, srcCols))
          // the write inside commitInsertRows consumes the allocator's
          // pinned blocks; identity CDC images read back committed files
          try commitInsertRows(table, snap, a, idSpecs) finally rel()
        }
      return MergeResult(0L, 0L, inserted, table.version)
    }

    // SQL MERGE cardinality: >1 source row matching the SAME target row is
    // an error, not a nondeterministic pick. With key-equality matching
    // that is exactly "a duplicated source key that exists in the target" —
    // one aggregation over the source + a semi-join against the distinct
    // target keys (both bounded by the smaller side; no all-pairs work).
    if (sqlSemantics && matchedClauses.nonEmpty)
      checkCardinality(table, snap, src, keyPairs, keyEq)

    val packed = src.select(
      struct(srcCols.map(col): _*).as("__src") +:
        keyPairs.map { case (tk, sk) => col(sk).as(s"__k_$tk") }: _*)

    val target = table.toDF(snap).withColumn("__file", col("_metadata.file_path"))
    val joinCond = keyPairs.map { case (tk, _) =>
      keyEq(tgtKeyExpr.getOrElse(tk, col(tk)), col(s"__k_$tk")) }.reduce(_ && _)

    // Which target files contain clause-affected matches (only those are
    // rewritten) and the per-clause-kind row counts — ONE pass over the
    // target⟕source join. The file list is bounded by the table's file
    // count (driver-side metadata by design, like the snapshot itself),
    // and flows back into the plan as a broadcast semi-join — never a
    // 50k-element In-expression.
    val joined = target.join(packed, joinCond, "left_outer")
    val matchedC = col("__src").isNotNull

    // First-true-wins effective conditions (null condition ⇒ not matched,
    // SQL three-valued logic; unconditional clause ⇒ always true). The
    // matched chain is gated on a source match, the not-matched-by-source
    // chain on its absence — together one per-row clause list over the
    // full outer-joined target.
    def chain(clauses: Seq[MergeClause], gate: Column): Seq[(Column, MergeAction)] =
      firstTrueWins(clauses.map(_.condition))
        .zip(clauses.map(_.action)).map { case (eff, a) => (gate && eff, a) }
    val effs: Seq[(Column, MergeAction)] =
      chain(matchedClauses, matchedC) ++ chain(notMatchedBySource, !matchedC)
    val deleteEff = effs.collect { case (e, MergeAction.Delete) => e }
      .reduceOption(_ || _).getOrElse(lit(false))
    val updateEff = effs.collect { case (e, a) if a != MergeAction.Delete => e }
      .reduceOption(_ || _).getOrElse(lit(false))

    // Census: ONE aggregation, restricted BEFORE the shuffle to the rows a
    // clause actually affects (each target row appears once: the source
    // side is key-deduped) — deleted/updated counts per file. Unaffected
    // rows never enter the aggregation, so the exchange carries O(affected)
    // rows, not O(table). Insert-only merges (no clauses at all) skip it.
    val perFile =
      if (effs.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else Logging.withJobDesc(spark, "graft:merge-census") {
        joined.filter(deleteEff || updateEff).groupBy(col("__file")).agg(
          sum(when(deleteEff, 1L).otherwise(0L)).as("__d"),
          sum(when(updateEff, 1L).otherwise(0L)).as("__u")).collect()
      }
    val dels = perFile.iterator.map(_.getLong(1)).sum
    val upds = perFile.iterator.map(_.getLong(2)).sum
    // Only files holding a clause-AFFECTED row are rewritten: a file whose
    // matched rows all fell through every clause keeps its data unchanged.
    val touchedFiles = perFile.iterator.map(_.getString(0)).toIndexedSeq

    // Every later pass over pre-image rows (the rewrite and the CDC
    // delete/update parts) needs only rows from TOUCHED files — affected
    // rows live there by the census's definition. Re-join a scan whose
    // FILE LIST is restricted to them (same trick the CoW delete uses,
    // DeltaTable.matchedFilesDF): at scale the rewrite reads O(touched)
    // files instead of re-scanning the whole table through a semi-join.
    // When the merge touches EVERY file the restriction removes nothing —
    // reuse the census join rather than paying a second scan relation.
    lazy val joinedTouched =
      if (touchedFiles.isEmpty || touchedFiles.size >= snap.activeFiles.size)
        joined
      else table.matchedFilesDF(snap, snap.activeFiles, touchedFiles)
        .join(packed, joinCond, "left_outer")

    val rewriteAdds =
      if (touchedFiles.isEmpty) Seq.empty[AddFile]
      else {
        val inFiles = joinedTouched
        val kept = inFiles.filter(!deleteEff)
        val rewritten =
          if (!GeneratedColumns.hasAny(schema))
            kept.select(postImageCols(dataCols, srcCols, effs): _*)
          else {
            // generated columns recompute over the POST-image values, gated
            // to clause-updated rows (the flag evaluates over the joined
            // pre-image frame); carried rows keep their materialized values
            val flagged = kept.select(
              postImageCols(dataCols, srcCols, effs) :+ updateEff.as("__upd"): _*)
            GeneratedColumns.regenerate(flagged, schema, Some(col("__upd")))
              .drop("__upd")
          }
        Logging.withJobDesc(spark, "graft:merge-rewrite") {
          table.writeDataFiles(rewritten.drop("__file"),
            snap.partitionColumns, snap.schema)
        }
      }

    // Inserts: source rows with no key match in the WHOLE target. Written
    // directly; the count comes from the files' own numRecords stats, so the
    // anti-join is evaluated once (no separate count job over the target).
    // The anti-join uses the SAME null-safe `<=>` conditions as the matched
    // join above: a plain equality anti-join would let a null-key source row
    // through (null = null is null), so the row would both UPDATE null-key
    // target rows via `<=>` and be INSERTED — one row, two effects.
    val insertFiles =
      if (!insertUnmatched) Nil
      else Logging.withJobDesc(spark, "graft:merge-insert") {
        val (a, rel) = allocInserts(
          buildInserts(antiJoinUnmatched(table, snap, src, keyPairs, sqlSemantics),
            inserts, schema, srcCols))
        // identity CDC insert parts read back the committed files, never
        // this frame — safe to drop the pinned blocks once written
        try writeInsertFiles(table, snap, a) finally rel()
      }
    val inserted = insertFiles.map(_._2).sum

    // ONE commit covering the rewrite AND the inserts: MERGE is atomic, so
    // no version — time travel, CDF, a concurrent reader, a crash between
    // jobs — may expose updates-without-inserts (the half-merged state the
    // model-based property spec caught when these were two commits).
    def cdcParts: Seq[DataFrame] = {
      // pre-images come from the touched-file-restricted join: affected
      // rows live only in touched files, so the full-table join is never
      // re-evaluated for CDC capture
      val deletePart: Seq[DataFrame] =
        if (dels == 0) Nil
        else Seq(joinedTouched.filter(deleteEff).select(dataCols.map(col): _*)
          .withColumn(Cdc.ChangeType, lit("delete")))
      val updatePart: Seq[DataFrame] =
        if (upds == 0) Nil
        else {
          val updated = joinedTouched.filter(updateEff)
          Seq(
            updated.select(dataCols.map(col): _*)
              .withColumn(Cdc.ChangeType, lit("update_preimage")),
            // postimage rows are all clause-updated: generated columns
            // recompute so the feed shows what was actually written
            GeneratedColumns.regenerate(
              updated.select(postImageCols(dataCols, srcCols, effs): _*),
              schema)
              .withColumn(Cdc.ChangeType, lit("update_postimage")))
        }
      val insertPart =
        if (insertFiles.isEmpty) Nil
        else if (idSpecs.nonEmpty)
          // allocated identity values are nondeterministic — read back the
          // COMMITTED insert files instead of re-running the allocator
          Seq(table.toDF(Snapshot(snap.version, snap.metadata, snap.protocol,
              insertFiles.map(_._1), Nil))
            .withColumn(Cdc.ChangeType, lit("insert")))
        else Seq(
          buildInserts(antiJoinUnmatched(table, snap, src, keyPairs, sqlSemantics),
            inserts, schema, srcCols)
          .withColumn(Cdc.ChangeType, lit("insert")))
      deletePart ++ updatePart ++ insertPart
    }
    val insertAlloc = if (insertFiles.nonEmpty) idSpecs else Nil
    if (touchedFiles.nonEmpty) {
      val v = table.commitFileRewrite(snap, touchedFiles.toSet,
        rewriteAdds ++ insertFiles.map(_._1), "MERGE", idAlloc = insertAlloc)
      captureMergeCdc(table, snap, v, cdcParts)
    } else if (insertFiles.nonEmpty) {
      val v = table.appendCommit(insertFiles.map(_._1), "MERGE-INSERT",
        Some(snap), insertAlloc)
      captureMergeCdc(table, snap, v, cdcParts)
    }
    MergeResult(upds, dels, inserted, table.version)
    }
    try body() finally { src.unpersist(false); () }
  }

  /** SQL MERGE cardinality: >1 source row matching the SAME target row is
    * an error, not a nondeterministic pick. With key-equality matching that
    * is exactly "a duplicated source key that exists in the target". Cost
    * shape: ONE aggregation over the source finds duplicated keys (usually
    * zero — the overwhelmingly common case pays nothing else); only when
    * duplicates exist does a semi-join against the column-pruned distinct
    * target keys decide whether any of them actually matches. */
  private def checkCardinality(table: DeltaTable, snap: Snapshot, src: DataFrame,
                               keyPairs: Seq[(String, String)],
                               keyEq: (Column, Column) => Column): Unit = {
    val srcKeys = keyPairs.map(_._2)
    val dups = src.groupBy(srcKeys.map(col): _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(keyPairs.map { case (tk, sk) => col(sk).as(s"__dk_$tk") }: _*)
    if (Logging.withJobDesc(table.spark, "graft:merge-cardcheck") {
        dups.head(1).isEmpty }) return
    val inTarget = dups.join(
      table.toDF(snap).select(keyPairs.map { case (tk, _) => col(tk) }: _*),
      keyPairs.map { case (tk, _) => keyEq(col(tk), col(s"__dk_$tk")) }.reduce(_ && _),
      "left_semi").head(1)
    if (inTarget.nonEmpty) throw new ValidationException(
      "MERGE cardinality violation: multiple source rows match the same " +
        s"target row (duplicate source key ${inTarget.head})")
  }

  /** SQL clause-order semantics as Columns: effective condition of clause i
    * is "condition i is TRUE and every earlier condition was not true"
    * (`coalesce(c, false)` realizes three-valued logic; an absent condition
    * is always-true and absorbs everything after it). */
  private def firstTrueWins(conds: Seq[Option[Column]]): Seq[Column] = {
    var priorNone: Column = lit(true)
    conds.map { c =>
      val raw = c.map(x => coalesce(x, lit(false))).getOrElse(lit(true))
      val eff = priorNone && raw
      priorNone = priorNone && !raw
      eff
    }
  }

  /** The NOT-MATCHED side as one distributed projection: filter the
    * unmatched source rows to those some insert clause accepts, then build
    * each TARGET column as the first-true-wins CASE over the clauses'
    * value expressions — `INSERT *` clauses copy same-named source columns,
    * explicit column lists evaluate their expressions, and target columns
    * a winning clause does not set come out NULL (SQL semantics). Output is
    * aligned (cast) to the table schema. */
  private def buildInserts(unmatched: DataFrame, inserts: Seq[InsertClause],
                           schema: org.apache.spark.sql.types.StructType,
                           srcCols: Seq[String]): DataFrame = {
    require(inserts.nonEmpty, "buildInserts requires at least one insert clause")
    val effs = firstTrueWins(inserts.map(_.condition)).zip(inserts.map(_.values))
    val any = effs.map(_._1).reduce(_ || _)
    def providedByAny(name: String): Boolean = effs.exists { case (_, values) =>
      values match {
        case None => srcCols.contains(name)
        case Some(m) => m.contains(name)
      }
    }
    val cols = schema.fields.toSeq.map { f =>
      effs.foldRight(lit(null).cast(f.dataType)) { case ((eff, values), acc) =>
        val v: Option[Column] = values match {
          case None => if (srcCols.contains(f.name)) Some(col(f.name)) else None
          case Some(m) => m.get(f.name)
        }
        v.map(e => when(eff, e).otherwise(acc)).getOrElse(acc)
      }.cast(f.dataType).as(f.name)
    }
    // identity columns a clause PROVIDES must be BY DEFAULT (GENERATED
    // ALWAYS refuses explicit values — Delta's rule); columns NO clause
    // provides are omitted from the image here and ALLOCATED from the
    // high-water mark by the caller (Delta's MERGE INSERT behavior)
    val ids = IdentityColumns.names(schema)
    IdentityColumns.validateProvided(schema, ids.filter(providedByAny), "MERGE INSERT")
    // generated columns NO insert clause provides are computed from the
    // built row; clause-provided ones keep their value (validated at write)
    val full = GeneratedColumns.computeMissing(
      unmatched.filter(any).select(cols: _*),
      schema, GeneratedColumns.names(schema).filter(providedByAny))
    // SPARSE insert image: columns NO clause provides (and that are not
    // generated) are OMITTED, not null-filled — omitted columns read back
    // NULL either way, and an explicit null would trip a NOT NULL
    // declaration the row never actually violates
    val keep = schema.fields.map(_.name).filter(n =>
      providedByAny(n) || GeneratedColumns.names(schema)(n))
    full.select(keep.map(n => col(s"`${n.replace("`", "``")}`")): _*)
  }

  /** Generated columns are computed and identity columns engine-assigned —
    * refuse UPDATE SET clauses naming either (same rule as
    * [[DeltaTable.update]]). */
  private def refuseGeneratedAssignments(
      schema: org.apache.spark.sql.types.StructType,
      clauses: Seq[MergeClause]): Unit =
    clauses.foreach {
      case MergeClause(_, MergeAction.UpdateSet(set)) =>
        GeneratedColumns.refuseAssignments(schema, set.keys, "MERGE UPDATE")
        val ids = IdentityColumns.names(schema)
        set.keys.find(ids).foreach(n => throw new ValidationException(
          s"MERGE UPDATE cannot SET identity column '$n': identity values " +
            "are assigned by the engine"))
      case _ => ()
    }

  /** Per-column post-image under the clause chain: outermost `when` is the
    * first clause (first-true-wins), fallthrough keeps the target value.
    * Delete clauses contribute nothing here — deletion is the row filter. */
  private def postImageCols(dataCols: Seq[String], srcCols: Seq[String],
                            effs: Seq[(Column, MergeAction)]): Seq[Column] =
    dataCols.map { c =>
      effs.foldRight(col(c)) { case ((eff, action), acc) =>
        action match {
          case MergeAction.Delete => acc
          case MergeAction.UpdateAll =>
            if (srcCols.contains(c)) when(eff, col(s"__src.$c")).otherwise(acc)
            else acc
          case MergeAction.UpdateSet(set) =>
            set.get(c).map(e => when(eff, e).otherwise(acc)).getOrElse(acc)
        }
      }.as(c)
    }


  /** The matched-path rewrite: `inFiles` is the target restricted to the
    * rewritten files, left-joined so matched rows carry their source row as
    * the `__src` struct (null = no match → keep verbatim). */
  private def resolveMatched(inFiles: DataFrame, dataCols: Seq[String],
                             srcCols: Seq[String], matched: MergeAction): DataFrame =
    matched match {
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

  /** Align `newRows` to the table schema (missing columns null, present ones
    * cast), allocate omitted identity columns, write, commit, and count
    * from the written files' own stats. */
  private def writeInserts(table: DeltaTable, snap: Snapshot,
                           newRows: DataFrame, srcCols: Seq[String]): Long = {
    val specs = IdentityColumns.specs(snap.schema)
    val aligned = alignToSchema(newRows, snap.schema, srcCols)
    val (assigned, rel) =
      if (specs.isEmpty) (aligned, () => ())
      else IdentityColumns.assign(table.spark, aligned, specs)
    try commitInsertRows(table, snap, assigned, specs) finally rel()
  }

  /** Write already-aligned rows WITHOUT committing: (AddFile, rowCount)
    * per non-empty file, zero-row part files deleted on the spot. The
    * caller owns the commit so rewrite + inserts can share one. */
  private def writeInsertFiles(table: DeltaTable, snap: Snapshot,
                               aligned: DataFrame): Seq[(AddFile, Long)] = {
    val adds = table.writeDataFiles(aligned, snap.partitionColumns, snap.schema)
    val counted = adds.map(a =>
      a -> a.stats.flatMap(FileStats.fromJsonString).map(_.numRecords).getOrElse(0L))
    counted.filterNot(_._2 > 0).foreach(a => table.deleteDataFile(a._1.path))
    counted.filter(_._2 > 0)
  }

  /** Write already-aligned rows, commit, count from written-file stats.
    * CDF-enabled tables get the inserts captured as `insert` change rows
    * (reference: processMergeNoMatch, src/cdc/index.ts:1993-1999).
    * `idAlloc`: specs identity values were allocated from — the commit
    * re-checks the marks (racer conflict) and the CDC image reads back the
    * committed files (re-running the allocator would assign fresh values). */
  private def commitInsertRows(table: DeltaTable, snap: Snapshot,
                               aligned: DataFrame,
                               idAlloc: Seq[IdentityColumns.Spec] = Nil): Long = {
    val nonEmpty = writeInsertFiles(table, snap, aligned)
    if (nonEmpty.nonEmpty) {
      val v = table.appendCommit(nonEmpty.map(_._1), "MERGE-INSERT",
        Some(snap), idAlloc)
      val image =
        if (idAlloc.isEmpty) aligned
        else table.toDF(Snapshot(v, snap.metadata, snap.protocol,
          nonEmpty.map(_._1), Nil))
      captureMergeCdc(table, snap, v,
        Seq(image.withColumn(Cdc.ChangeType, lit("insert"))))
    }
    nonEmpty.map(_._2).sum
  }

  /** CDF capture for MERGE (reference: processMergeMatch/processMergeNoMatch
    * + finalizeCommit, src/cdc/index.ts:1975-2046): matched rows emit
    * update_preimage/update_postimage (delete under MergeAction.Delete or a
    * deleting closure), unmatched-source inserts emit insert — one CDC file
    * for the whole commit. The part DataFrames are lazy and derived from the
    * PINNED pre-merge snapshot, so evaluating them after the commit still
    * reads consistent pre-images (CoW leaves the old files in place, and a
    * DV-mask commit changes only log metadata). No-op unless the table has
    * CDC configured. */
  private def captureMergeCdc(table: DeltaTable, snap: Snapshot, v: Long,
                              parts: => Seq[DataFrame]): Unit =
    if (table.cdcConfigured(snap)) Logging.withJobDesc(table.spark, "graft:merge-cdc") {
      val nonEmpty = parts
      if (nonEmpty.nonEmpty)
        // insert parts are SPARSE (omitted columns), other parts full
        // width — missing columns fill NULL, the value they read anyway
        Cdc.writeChanges(table, v,
          nonEmpty.reduce(_.unionByName(_, allowMissingColumns = true)),
          System.currentTimeMillis())
    }

  /**
   * Merge under an ARBITRARY match condition — the reference's
   * `matchCondition(existing, incoming)` closure (src/cdc/index.ts:1937-2005)
   * as a Catalyst predicate over aliases `t` (target) and `s` (source), e.g.
   * {{{ col("t.id") === col("s.id") && col("s.ts") > col("t.ts") }}}.
   *
   * The reference resolves sequentially: each incoming row binds to the
   * FIRST matching existing row. A distributed engine has no scan order, so
   * resolution is made deterministic instead:
   *   1. candidate pairs come from a theta join on `matchCondition`;
   *   2. each source row picks its first matching target in TABLE order
   *      (file path, row index — the order the reference would scan);
   *   3. each target row resolves at most ONE source row (smallest by a
   *      deterministic hash of the source row) — first-occurrence-wins,
   *      like the key-based merge's dropDuplicates.
   * A source row whose only matches were claimed by other source rows is
   * NOT inserted (it matched; the reference would have applied it to the
   * same row sequentially).
   *
   * SCALE: an arbitrary condition cannot hash-partition, so the join is a
   * broadcast-nested-loop when `source` is small (the intended shape —
   * Spark broadcasts it automatically) and a cartesian otherwise. For
   * key-equality conditions use [[execute]], which shuffles on the keys.
   */
  def executeCondition(table: DeltaTable, source: DataFrame,
                       matchCondition: Column, matched: MergeAction,
                       insertUnmatched: Boolean): MergeResult = {
    val snap = table.snapshot()
    val schema = snap.schema
    val dataCols = schema.fieldNames.toSeq
    val srcCols = source.columns.toSeq

    // Empty active set: nothing can match; every source row is an insert.
    if (snap.activeFiles.isEmpty) {
      val inserted =
        if (!insertUnmatched) 0L else writeInserts(table, snap, source, srcCols)
      return MergeResult(0L, 0L, inserted, table.version)
    }

    val target = table.toDF(snap)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__rix", col("_metadata.row_index"))
    val src = source.select(
      struct(srcCols.map(col): _*).as("__srow"))
      .withColumn("__sid", xxhash64(col("__srow")))

    // Cached: the candidate-pair set feeds the match census, the rewrite
    // join, and the insert anti-join — without the barrier the theta join
    // (the dominant cost) would evaluate three times.
    val pairs = target.as("t")
      .join(src.select(srcCols.map(c => col(s"__srow.$c").as(c)) :+
          col("__srow") :+ col("__sid"): _*).as("s"),
        matchCondition, "inner")
      .select(col("__file"), col("__rix"), col("__sid"), col("__srow"))
      .cache()

    // Deterministic first-match resolution (scaladoc steps 2 and 3).
    val bySource = Window.partitionBy(col("__srow")).orderBy(col("__file"), col("__rix"))
    val byTarget = Window.partitionBy(col("__file"), col("__rix"))
      .orderBy(col("__sid"), col("__srow"))
    val chosen = pairs
      .withColumn("__r1", row_number().over(bySource)).filter(col("__r1") === 1)
      .withColumn("__r2", row_number().over(byTarget)).filter(col("__r2") === 1)
      .select(col("__file"), col("__rix"), col("__srow").as("__src"))

    val (nMatched, matchedFiles) = matchedCensus(chosen)

    // rewrite + CDC passes scan only the matched FILES (file-list
    // restriction, like the CoW delete) — matched rows live there by the
    // census's definition, so the full target is never re-scanned; all
    // files matched ⇒ nothing to restrict, reuse the existing scan
    lazy val touchedTarget =
      if (matchedFiles.size >= snap.activeFiles.size) target
      else table
        .matchedFilesDF(snap, snap.activeFiles, matchedFiles)
        .withColumn("__rix", col("_metadata.row_index"))

    val (rewriteAdds, updated, deleted) =
      if (matchedFiles.isEmpty) (Seq.empty[AddFile], 0L, 0L)
      else {
        val inFiles = touchedTarget
          .join(chosen, Seq("__file", "__rix"), "left_outer")
        val rewritten =
          // matched rows got a new image: recompute their generated columns
          // (Delete keeps only untouched rows — nothing to recompute)
          if (matched == MergeAction.Delete ||
              !GeneratedColumns.hasAny(snap.schema))
            resolveMatched(inFiles, dataCols, srcCols, matched)
          else {
            val flagged = resolveMatched(
              inFiles.withColumn("__upd0", col("__src").isNotNull),
              dataCols :+ "__upd0", srcCols, matched)
            GeneratedColumns.regenerate(flagged, snap.schema,
              Some(col("__upd0"))).drop("__upd0")
          }
        val dels = if (matched == MergeAction.Delete) nMatched else 0L
        val upds = if (matched == MergeAction.Delete) 0L else nMatched
        val adds = table.writeDataFiles(rewritten.drop("__file").drop("__rix"),
          snap.partitionColumns, snap.schema)
        (adds, upds, dels)
      }

    val idSpecs = IdentityColumns.specs(schema)
    val insertFiles =
      if (!insertUnmatched) Nil
      else {
        // Source rows that matched NOTHING (null-safe whole-row identity).
        val unmatched = src
          .join(pairs.select(col("__srow").as("__mrow")).distinct(),
            col("__srow") <=> col("__mrow"), "left_anti")
          .select(srcCols.map(c => col(s"__srow.$c").as(c)): _*)
        val aligned = alignToSchema(unmatched, schema, srcCols)
        val (assigned, rel) =
          if (idSpecs.isEmpty) (aligned, () => ())
          else IdentityColumns.assign(table.spark, aligned, idSpecs)
        try writeInsertFiles(table, snap, assigned) finally rel()
      }
    val inserted = insertFiles.map(_._2).sum

    // Atomic MERGE: one commit for rewrite + inserts (see [[execute]]).
    // CDC parts evaluate against the still-cached pair set, so capture
    // happens before unpersist.
    def cdcParts: Seq[DataFrame] = {
      val matchedPairs = touchedTarget
        .join(chosen, Seq("__file", "__rix"), "inner")
      val matchedPart: Seq[DataFrame] =
        if (nMatched == 0) Nil
        else matched match {
          case MergeAction.Delete =>
            Seq(matchedPairs.select(dataCols.map(col): _*)
              .withColumn(Cdc.ChangeType, lit("delete")))
          case _ =>
            val postCols = matched match {
              case MergeAction.UpdateSet(set) =>
                dataCols.map(c => set.get(c).map(_.as(c)).getOrElse(col(c)))
              case _ => dataCols.map { c =>
                if (srcCols.contains(c)) col(s"__src.$c").as(c) else col(c) }
            }
            Seq(
              matchedPairs.select(dataCols.map(col): _*)
                .withColumn(Cdc.ChangeType, lit("update_preimage")),
              // postimage rows are all matched-updated: recompute generated
              GeneratedColumns.regenerate(
                matchedPairs.select(postCols: _*), schema)
                .withColumn(Cdc.ChangeType, lit("update_postimage")))
        }
      val insertPart =
        if (insertFiles.isEmpty) Nil
        else if (idSpecs.nonEmpty)
          // allocated identity values are nondeterministic — read back the
          // committed insert files instead of re-running the allocator
          Seq(table.toDF(Snapshot(snap.version, snap.metadata, snap.protocol,
              insertFiles.map(_._1), Nil))
            .withColumn(Cdc.ChangeType, lit("insert")))
        else {
          val unmatched = src
            .join(pairs.select(col("__srow").as("__mrow")).distinct(),
              col("__srow") <=> col("__mrow"), "left_anti")
            .select(srcCols.map(c => col(s"__srow.$c").as(c)): _*)
          Seq(alignToSchema(unmatched, schema, srcCols)
            .withColumn(Cdc.ChangeType, lit("insert")))
        }
      matchedPart ++ insertPart
    }
    val insertAlloc = if (insertFiles.nonEmpty) idSpecs else Nil
    if (matchedFiles.nonEmpty) {
      val v = table.commitFileRewrite(snap, matchedFiles.toSet,
        rewriteAdds ++ insertFiles.map(_._1), "MERGE", idAlloc = insertAlloc)
      captureMergeCdc(table, snap, v, cdcParts)
    } else if (insertFiles.nonEmpty) {
      val v = table.appendCommit(insertFiles.map(_._1), "MERGE-INSERT",
        Some(snap), insertAlloc)
      captureMergeCdc(table, snap, v, cdcParts)
    }
    pairs.unpersist(false)
    MergeResult(updated, deleted, inserted, table.version)
  }

  /** Matched-row count and matched-file list, aggregated as one ROW PER FILE
    * (`groupBy(__file).count`) rather than a single `collect_set` cell: the
    * per-file shape keeps every aggregation row bounded and map-side
    * combinable, where a 10⁵-file set in one array cell would be assembled
    * by a single task as one multi-MB row. The collected list itself is
    * fine — the driver must enumerate the removes for the commit anyway. */
  private def matchedCensus(matchedRows: DataFrame): (Long, Seq[String]) = {
    val perFile = matchedRows.groupBy(col("__file"))
      .agg(count(lit(1)).as("n")).collect()
    (perFile.iterator.map(_.getLong(1)).sum,
      perFile.iterator.map(_.getString(0)).toIndexedSeq)
  }

  /** Source rows with no key match in the target, under the SAME null-safe
    * `<=>` key semantics as the matched-path join (see note in [[execute]]). */
  /**
   * Merge-on-read MERGE: matched target rows are DV-masked in their files
   * and their merged images (plus unmatched-source inserts) appended as
   * new files — ONE commit, zero target files rewritten. Same semantics as
   * [[execute]] (null-safe key equality, first-match source dedup,
   * Delete/UpdateAll/UpdateSet actions); the right merge when a trickle of
   * updates lands on huge files. The per-file mask bitmaps are built on the
   * executors ([[DeletionVectors.bitmapAgg]]); the driver sees only
   * compressed descriptors. Mass merges should still prefer [[execute]]
   * (CoW), which reclaims masked storage.
   */
  def executeMoR(table: DeltaTable, source: DataFrame, keyColumns: Seq[String],
                 matched: MergeAction = MergeAction.UpdateAll,
                 insertUnmatched: Boolean = true): MergeResult =
    executeClausesMoR(table, source, keyColumns.map(k => (k, k)),
      Seq(MergeClause(None, matched)),
      if (insertUnmatched) Seq(InsertClause(None)) else Nil)

  /**
   * The clause-chain MoR twin of [[executeClauses]]: full SQL MERGE
   * semantics — conditional multi-clause matched side, NOT MATCHED BY
   * SOURCE, multiple conditional inserts, the same `sqlSemantics` contract
   * — with ZERO target files rewritten. Every clause-AFFECTED target row
   * (deleted OR updated) is DV-masked in its file; updated rows' post-
   * images and the unmatched-source inserts land as appended files; all of
   * it one atomic `commitDvMask`. Rows a clause chain leaves untouched
   * cost nothing — their files aren't even masked.
   */
  def executeClausesMoR(table: DeltaTable, source: DataFrame,
                        keyPairs: Seq[(String, String)],
                        matchedClauses: Seq[MergeClause],
                        inserts: Seq[InsertClause],
                        notMatchedBySource: Seq[MergeClause] = Nil,
                        sqlSemantics: Boolean = false,
                        // see executeClauses
                        tgtKeyExpr: Map[String, Column] = Map.empty): MergeResult = {
    require(notMatchedBySource.forall(_.action != MergeAction.UpdateAll),
      "NOT MATCHED BY SOURCE cannot UPDATE SET * (no source row to copy)")
    require(keyPairs.nonEmpty, "merge requires at least one key column")
    val snap = table.snapshot()
    val schema = snap.schema
    refuseGeneratedAssignments(schema, matchedClauses ++ notMatchedBySource)
    val dataCols = schema.fieldNames.toSeq
    val tgtKeys = keyPairs.map(_._1)
    val srcKeys = keyPairs.map(_._2)
    require(tgtKeys.forall(dataCols.contains), s"keys must exist in table: $tgtKeys")
    def keyEq(l: Column, r: Column): Column = if (sqlSemantics) l === r else l <=> r
    // persist across the census/image/insert/CDC passes — see the CoW twin
    val src = (if (sqlSemantics) source else source.dropDuplicates(srcKeys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcCols = src.columns.toSeq
    val insertUnmatched = inserts.nonEmpty
    def body(): MergeResult = {
    // Identity allocation for insert images — see [[executeClauses]].
    val idSpecs = IdentityColumns.specs(schema)
    def allocInserts(df: DataFrame): (DataFrame, () => Unit) =
      if (idSpecs.isEmpty) (df, () => ())
      else IdentityColumns.assign(table.spark, df, idSpecs)
    if (snap.activeFiles.isEmpty) {
      val inserted =
        if (!insertUnmatched) 0L
        else {
          val (a, rel) = allocInserts(buildInserts(src, inserts, schema, srcCols))
          try commitInsertRows(table, snap, a, idSpecs) finally rel()
        }
      return MergeResult(0L, 0L, inserted, table.version)
    }
    if (sqlSemantics && matchedClauses.nonEmpty)
      checkCardinality(table, snap, src, keyPairs, keyEq)
    val packed = src.select(
      struct(srcCols.map(col): _*).as("__src") +:
        keyPairs.map { case (tk, sk) => col(sk).as(s"__k_$tk") }: _*)
    val target = table.toDF(snap)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__ri", col("_metadata.row_index"))
    val joinCond = keyPairs.map { case (tk, _) =>
      keyEq(tgtKeyExpr.getOrElse(tk, col(tk)), col(s"__k_$tk")) }.reduce(_ && _)
    val joined = target.join(packed, joinCond, "left_outer")
    val matchedC = col("__src").isNotNull
    def chain(clauses: Seq[MergeClause], gate: Column): Seq[(Column, MergeAction)] =
      firstTrueWins(clauses.map(_.condition))
        .zip(clauses.map(_.action)).map { case (eff, a) => (gate && eff, a) }
    val effs: Seq[(Column, MergeAction)] =
      chain(matchedClauses, matchedC) ++ chain(notMatchedBySource, !matchedC)
    val deleteEff = effs.collect { case (e, MergeAction.Delete) => e }
      .reduceOption(_ || _).getOrElse(lit(false))
    val updateEff = effs.collect { case (e, a) if a != MergeAction.Delete => e }
      .reduceOption(_ || _).getOrElse(lit(false))

    // ONE pass builds the per-file mask bitmaps AND the clause-kind counts:
    // affected = masked out of the old file, whether the clause deletes the
    // row or replaces it (the replacement is an appended post-image).
    val dvRows = Logging.withJobDesc(table.spark, "graft:merge-census") {
      joined.filter(deleteEff || updateEff)
        .groupBy(col("__file"))
        .agg(DeletionVectors.bitmapAgg(col("__ri")).as("__dv"),
          sum(when(deleteEff, 1L).otherwise(0L)).as("__d"),
          sum(when(updateEff, 1L).otherwise(0L)).as("__u"))
        .collect()
    }
    val dels = dvRows.iterator.map(_.getLong(2)).sum
    val upds = dvRows.iterator.map(_.getLong(3)).sum
    val nMasked = dels + upds
    val dvByPath: Map[String, Array[Byte]] = dvRows.map(r =>
      new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath ->
        r.getAs[Array[Byte]](1)).toMap
    // Image and CDC passes read only rows of the MASKED files (affected
    // rows live there by the census's definition): re-join a file-list-
    // restricted scan — O(masked files) instead of a full re-scan. All
    // files masked ⇒ the restriction removes nothing; reuse the join.
    lazy val joinedTouched =
      if (dvRows.isEmpty || dvRows.length >= snap.activeFiles.size) joined
      else table.matchedFilesDF(snap, snap.activeFiles,
          dvRows.map(_.getString(0)).toIndexedSeq)
        .join(packed, joinCond, "left_outer")
    val imageAdds =
      if (upds == 0) Nil
      else Logging.withJobDesc(table.spark, "graft:merge-rewrite") {
        table.writeDataFiles(
          // every image row IS an update — regenerate unconditionally
          GeneratedColumns.regenerate(
            joinedTouched.filter(updateEff)
              .select(postImageCols(dataCols, srcCols, effs): _*),
            snap.schema),
          snap.partitionColumns, snap.schema)
      }
    val insertsAllocated =
      if (!insertUnmatched) None
      else Some(allocInserts(buildInserts(
        antiJoinUnmatched(table, snap, src, keyPairs, sqlSemantics),
        inserts, schema, srcCols)))
    // the non-identity CDC insert part below re-evaluates the frame
    // (releasing is a no-op there); the identity part reads committed
    // files back, so the pinned blocks can drop once written
    val insertsAligned = insertsAllocated.map(_._1)
    val insertAdds =
      try insertsAligned.toSeq.flatMap(df =>
        table.writeDataFiles(df, snap.partitionColumns, snap.schema))
      finally insertsAllocated.foreach(_._2())
    val inserted = insertAdds
      .flatMap(_.stats.flatMap(FileStats.fromJsonString)).map(_.numRecords).sum
    if (nMasked == 0 && insertAdds.isEmpty)
      return MergeResult(0L, 0L, 0L, table.version)
    val insertAlloc = if (insertAdds.nonEmpty) idSpecs else Nil
    val v =
      if (nMasked == 0) table.appendCommit(insertAdds, "MERGE-INSERT",
        Some(snap), insertAlloc)
      else table.commitDvMask(snap, dvByPath,
        imageAdds ++ insertAdds, "MERGE", nMasked, idAlloc = insertAlloc)
    captureMergeCdc(table, snap, v, {
      val deletePart: Seq[DataFrame] =
        if (dels == 0) Nil
        else Seq(joinedTouched.filter(deleteEff).select(dataCols.map(col): _*)
          .withColumn(Cdc.ChangeType, lit("delete")))
      val updatePart: Seq[DataFrame] =
        if (upds == 0) Nil
        else {
          val updated = joinedTouched.filter(updateEff)
          Seq(
            updated.select(dataCols.map(col): _*)
              .withColumn(Cdc.ChangeType, lit("update_preimage")),
            // postimage rows are all clause-updated: generated columns
            // recompute so the feed shows what was actually written
            GeneratedColumns.regenerate(
              updated.select(postImageCols(dataCols, srcCols, effs): _*),
              schema)
              .withColumn(Cdc.ChangeType, lit("update_postimage")))
        }
      val insertPart =
        if (inserted == 0) Nil
        else if (idSpecs.nonEmpty)
          // allocated values are nondeterministic — read back the
          // committed insert files (see executeClauses)
          Seq(table.toDF(Snapshot(snap.version, snap.metadata, snap.protocol,
              insertAdds, Nil))
            .withColumn(Cdc.ChangeType, lit("insert")))
        else insertsAligned.map(_.withColumn(Cdc.ChangeType, lit("insert"))).toSeq
      deletePart ++ updatePart ++ insertPart
    })
    MergeResult(upds, dels, inserted, v)
    }
    try body() finally { src.unpersist(false); () }
  }

  private def alignToSchema(newRows: DataFrame, schema: org.apache.spark.sql.types.StructType,
                            srcCols: Seq[String]): DataFrame = {
    // identity columns the source PROVIDES must be BY DEFAULT (GENERATED
    // ALWAYS refuses explicit values); omitted ones are allocated by the
    // caller from the high-water mark before the image is written
    val ids = IdentityColumns.names(schema)
    IdentityColumns.validateProvided(schema, srcCols.filter(ids), "MERGE INSERT")
    // generated columns the source omits are COMPUTED (not null-filled);
    // source-provided ones keep their value and are validated at write.
    // The image is SPARSE: columns the source does not provide (and that
    // are not generated) are OMITTED — they read back NULL either way,
    // and an explicit null would trip a NOT NULL declaration.
    val full = GeneratedColumns.computeMissing(
      newRows.select(schema.fields.map { f =>
        if (srcCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*),
      schema, srcCols.toSet)
    val keep = schema.fields.map(_.name).filter(n =>
      srcCols.contains(n) || GeneratedColumns.names(schema)(n))
    full.select(keep.map(n => col(s"`${n.replace("`", "``")}`")): _*)
  }

  private def antiJoinUnmatched(table: DeltaTable, snap: Snapshot,
                                src: DataFrame, keyPairs: Seq[(String, String)],
                                sqlSemantics: Boolean = false): DataFrame = {
    val targetKeys = table.toDF(snap)
      .select(keyPairs.map { case (tk, _) => col(tk).as(s"__tk_$tk") }: _*).distinct()
    val antiCond = keyPairs.map { case (tk, sk) =>
      if (sqlSemantics) col(sk) === col(s"__tk_$tk")
      else col(sk) <=> col(s"__tk_$tk")
    }.reduce(_ && _)
    src.join(targetKeys, antiCond, "left_anti")
  }

  /** Pre-rewrite LIVE row count of the matched files, from their AddFile
    * stats — None when any matched file lacks numRecords or carries a
    * deletion vector (stats are physical counts; DV-masked files need the
    * fallback count job). */
  private def statsRowCount(table: DeltaTable, snap: Snapshot,
                            matchedFiles: Seq[String]): Option[Long] = {
    val matchedSet = matchedFiles
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet
    val files = snap.activeFiles.filter { f =>
      matchedSet.contains(
        new org.apache.hadoop.fs.Path(table.tablePath, f.path).toUri.getPath)
    }
    val counts = files.map { f =>
      if (f.deletionVector.isDefined) None
      else f.parsedStats.map(_.numRecords)
    }
    if (files.size != matchedSet.size || counts.exists(_.isEmpty)) None
    else Some(counts.flatten.sum)
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

    // Empty active set: every source row goes through whenNotMatched.
    if (snap.activeFiles.isEmpty) {
      val shaped = src.flatMap(r => whenNotMatched(r))(Encoders.row(schema))
      return MergeResult(0L, 0L,
        commitInsertRows(table, snap, shaped.toDF()), table.version)
    }

    val packed = src.select(
      struct(srcCols.map(col): _*).as("__src") +: keyColumns.map(k => col(k).as(s"__k_$k")): _*)
    val target = table.toDF(snap).withColumn("__file", col("_metadata.file_path"))
    val joinCond = keyColumns.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    val joined = target.join(packed, joinCond, "left_outer")
    val (nMatched, matchedFiles) =
      matchedCensus(joined.filter(col("__src").isNotNull))

    // rewrite + CDC passes over matched files only (file-list restriction;
    // matched rows live there by the census's definition); all files
    // matched ⇒ nothing to restrict, reuse the census join
    lazy val joinedTouched =
      if (matchedFiles.isEmpty || matchedFiles.size >= snap.activeFiles.size)
        joined
      else table.matchedFilesDF(snap, snap.activeFiles, matchedFiles)
        .join(packed, joinCond, "left_outer")

    val (rewriteAdds, updated, deleted) =
      if (matchedFiles.isEmpty) (Seq.empty[AddFile], 0L, 0L)
      else {
        val inFiles = joinedTouched
        val nData = dataCols.size
        val srcIdx = inFiles.columns.indexOf("__src")
        // Pre-rewrite live row count of the matched files, needed below to
        // derive the update count FROM DATA. Stats cover it for free; the
        // fallback count job runs only for stats-less or DV-masked files.
        val rowsBefore = statsRowCount(table, snap, matchedFiles)
          .getOrElse(inFiles.count())
        val rewritten = inFiles.flatMap { row =>
          val existing = Row.fromSeq((0 until nData).map(row.get))
          if (row.isNullAt(srcIdx)) Some(existing) // unmatched row in the file: keep
          else whenMatched(existing, row.getStruct(srcIdx))
        }(Encoders.row(schema))
        // closure-produced rows are indistinguishable from kept ones here,
        // so generated columns recompute over EVERY rewritten row (a kept
        // row's recompute is the identity on a consistent table)
        val adds = table.writeDataFiles(
          GeneratedColumns.regenerate(rewritten.toDF(), snap.schema),
          snap.partitionColumns, snap.schema)
        // Counts derive from written bytes, not a transformation-side
        // accumulator (Spark only guarantees exactly-once accumulator updates
        // in actions; task retries/speculation would over-count). Unmatched
        // rows in the files are kept verbatim, so:
        //   written = (rowsBefore - nMatched) + kept
        val written = adds
          .flatMap(_.parsedStats.map(_.numRecords)).sum
        val kept = written - (rowsBefore - nMatched)
        (adds, kept, nMatched - kept)
      }

    val insertFiles = {
      val newRows = antiJoinUnmatched(table, snap, src, keyColumns.map(k => (k, k)))
      val shaped = newRows.flatMap(r => whenNotMatched(r))(Encoders.row(schema))
      writeInsertFiles(table, snap, shaped.toDF())
    }
    val inserts = insertFiles.map(_._2).sum

    // Atomic MERGE: one commit for rewrite + inserts (see [[execute]]).
    // CDC re-runs the closures over the matched pairs only — the reference
    // likewise derives the change records from the closure results
    // (processMergeMatch: null ⇒ delete record, row ⇒ pre+post records).
    def cdcParts: Seq[DataFrame] = {
      val cdcSchema = schema.add(Cdc.ChangeType,
        org.apache.spark.sql.types.StringType)
      val nData = dataCols.size
      val srcIdx = joinedTouched.columns.indexOf("__src")
      val matchedPart: Seq[DataFrame] =
        if (matchedFiles.isEmpty) Nil
        else Seq(joinedTouched.filter(col("__src").isNotNull).flatMap { row =>
          val existing = Row.fromSeq((0 until nData).map(row.get))
          whenMatched(existing, row.getStruct(srcIdx)) match {
            case Some(updatedRow) => Seq(
              Row.fromSeq(existing.toSeq :+ "update_preimage"),
              Row.fromSeq(updatedRow.toSeq :+ "update_postimage"))
            case None => Seq(Row.fromSeq(existing.toSeq :+ "delete"))
          }
        }(Encoders.row(cdcSchema)).toDF())
      val insertPart =
        if (insertFiles.isEmpty) Nil
        else Seq(antiJoinUnmatched(table, snap, src, keyColumns.map(k => (k, k)))
          .flatMap(r => whenNotMatched(r))(Encoders.row(schema)).toDF()
          .withColumn(Cdc.ChangeType, lit("insert")))
      matchedPart ++ insertPart
    }
    if (matchedFiles.nonEmpty) {
      val v = table.commitFileRewrite(snap, matchedFiles.toSet,
        rewriteAdds ++ insertFiles.map(_._1), "MERGE")
      captureMergeCdc(table, snap, v, cdcParts)
    } else if (insertFiles.nonEmpty) {
      val v = table.appendCommit(insertFiles.map(_._1), "MERGE-INSERT")
      captureMergeCdc(table, snap, v, cdcParts)
    }
    MergeResult(updated, deleted, inserts, table.version)
  }
}
