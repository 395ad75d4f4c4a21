package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import org.json4s.{JArray, JBool, JDouble, JLong, JNothing, JNull, JObject, JString, JValue}

import graft.delta.{DeltaTable, Snapshot, Txn, ValidationException}

/**
 * Batch DataSource relation for graft Delta tables:
 * `spark.read.format("graft-delta").load(path)` and
 * `df.write.format("graft-delta").mode(...).save(path)` — the reader/writer
 * API a Spark user expects next to the table object API (north-star; the
 * reference's entry points are its TypeScript classes,
 * src/delta/table.ts:694,1482).
 *
 * Read options: `versionAsOf` (version time travel), `timestampAsOf`
 * (epoch millis — state at the last commit at or before it). Column
 * pruning and translatable filters are pushed into the inner scan, so the
 * parquet reader sees them (`PushedFilters` in the plan); Spark re-applies
 * every filter on top, so partially-translated predicates stay correct.
 *
 * Write options: `partitionBy` (comma-separated, first write only).
 * SaveMode mapping: Append/Overwrite → the table's transactional write;
 * ErrorIfExists fails on a non-empty table; Ignore is a no-op then.
 */
final class DeltaRelation(
    val sqlContext: SQLContext,
    private[sources] val table: DeltaTable,
    version: Option[Long],
    timestampMs: Option[Long])
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** Filters [[buildScan]] applies INSIDE the scan (via
    * [[DeltaRelation.toColumn]] — the same Catalyst operators Spark would
    * use) are handled: re-declaring them unhandled would stack a second
    * per-row evaluation of every pushed predicate on top of the scan.
    * Only plain top-level column references qualify — dotted or
    * backquoted names could resolve differently through `col(...)`. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot { f =>
      f.references.nonEmpty &&
        f.references.forall(r =>
          !r.contains(".") && !r.contains("`") && schema.fieldNames.contains(r)) &&
        DeltaRelation.toColumn(f).isDefined
    }

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` (and `df.write.insertInto`)
    * land as transactional table writes. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    table.write(data, if (overwrite) "overwrite" else "append")
    ()
  }

  private def resolvedVersion(): Option[Long] = timestampMs match {
    case Some(ts) => Some(table.versionAt(ts))
    case None => version
  }

  // Schema needs only the log's metadata — resolving it through the
  // metadata-only snapshot keeps relation construction O(1) in file count.
  override val schema: StructType =
    table.toDF(table.metaSnapshot(resolvedVersion())).schema

  /** Partition columns from metadata alone (O(1) in file count). */
  private[sources] lazy val partitionColumnSet: Set[String] =
    table.metaSnapshot(resolvedVersion()).partitionColumns.toSet

  /** Driver-materialized snapshot pinned at an explicit version, for DSv2
    * filter claiming; None above the distributed-snapshot threshold
    * (then [[distributedClaim]] is the claim path). */
  private[sources] def claimState(): Option[(Long, Snapshot)] =
    table.pinnedScanState(resolvedVersion())

  /** Distributed claimability over the pinned version — the claim path
    * for tables above the snapshot threshold (round 15). Returns the
    * claimable subset of `candidates`; the kept FILE set is not
    * materialized (downstream consumers re-run the exact tri-state eval
    * over their pruned survivors — see [[exactClaimKeep]]). */
  private[sources] def distributedClaim(
      candidates: Seq[Filter]): Option[(Long, Seq[Filter])] =
    table.distributedClaim(resolvedVersion(), candidates, schema)

  /** Restrict pruned survivors to the files EVERY claimed filter decides
    * True on. `Some(paths)` is the pushFilters-time memoized claim (driver
    * path — one tri-state evaluation per query); `None` re-runs the eval
    * per file (distributed path — the verdict is a pure function of the
    * file's partition values, so re-evaluation is exact and the 10⁷-path
    * set never has to exist). */
  private def exactClaimKeep(snap: Snapshot, claimed: Array[Filter],
                             claimedPaths: Option[Set[String]]): Seq[graft.delta.AddFile] =
    claimedPaths match {
      case Some(paths) => snap.activeFiles.filter(f => paths.contains(f.path))
      case None =>
        val pc = snap.partitionColumns.toSet
        snap.activeFiles.filter(f => claimed.forall(flt =>
          graft.delta.PartitionFilters.eval(f, flt, pc, schema)
            .contains(graft.delta.PartitionFilters.True)))
    }

  /** The exactly-matching file subset for CLAIMED partition filters over
    * the pinned snapshot.
    *
    * Scale bound: the survivors materialize on the driver here — bounded
    * by Spark's own scan planning for the same predicate. The UNGROUPED
    * aggregate path no longer comes through here at all above the
    * snapshot threshold ([[answerAggregates]] routes to the distributed
    * combine-form fold, whose driver traffic is one Partial per RDD
    * partition); what remains on this floor is the GROUPED fold and the
    * row scan itself, both of which genuinely need the per-file list. */
  private def claimedFiles(pinnedVersion: Option[Long],
                           claimed: Array[Filter],
                           claimedPaths: Option[Set[String]]): (Snapshot, Seq[graft.delta.AddFile]) = {
    val snap = table.scanState(pinnedVersion.orElse(resolvedVersion()),
      DeltaRelation.pruneJson(claimed))
    if (claimed.isEmpty) (snap, snap.activeFiles)
    else (snap, exactClaimKeep(snap, claimed, claimedPaths))
  }

  /** Metadata-only aggregate answer over this relation's (possibly
    * time-traveled) snapshot, optionally restricted to the exact subset a
    * set of CLAIMED partition filters selects — see
    * [[graft.delta.StatsAggregates]]. None refuses (caller falls back to
    * the ordinary scan). */
  private[sources] def answerAggregates(
      aggs: Seq[graft.delta.StatsAggregates.StatAgg],
      pinnedVersion: Option[Long] = None,
      claimed: Array[Filter] = Array.empty,
      claimedPaths: Option[Set[String]] = None): Option[Seq[Any]] = {
    // Above the snapshot threshold: the combine-form fold — per-file
    // contributions merged on executors, one Partial per partition on the
    // driver, no file list anywhere (round 16). Below it, the memoized
    // driver fold is strictly cheaper than a Spark job.
    table.distributedAggregates(
        pinnedVersion.orElse(resolvedVersion()), claimed.toSeq, schema, aggs) match {
      case Some(folded) => folded
      case None =>
        val (snap, files) = claimedFiles(pinnedVersion, claimed, claimedPaths)
        graft.delta.StatsAggregates.answerFiles(files,
          snap.partitionColumns.toSet, schema, aggs)
    }
  }

  /** GROUP-BY-partition-columns twin of [[answerAggregates]] — one row per
    * surviving partition group. */
  private[sources] def answerGroupedAggregates(groupCols: Seq[String],
      aggs: Seq[graft.delta.StatsAggregates.StatAgg],
      pinnedVersion: Option[Long] = None,
      claimed: Array[Filter] = Array.empty,
      claimedPaths: Option[Set[String]] = None): Option[Seq[Seq[Any]]] = {
    // Same routing as [[answerAggregates]]: above the snapshot threshold
    // the grouped combine fold keeps the driver at O(groups), never
    // O(files) (round 16).
    table.distributedGroupedAggregates(
        pinnedVersion.orElse(resolvedVersion()), claimed.toSeq, schema,
        groupCols, aggs) match {
      case Some(folded) => folded
      case None =>
        val (snap, files) = claimedFiles(pinnedVersion, claimed, claimedPaths)
        graft.delta.StatsAggregates.answerGroupedFiles(files,
          snap.partitionColumns.toSet, schema, groupCols, aggs)
    }
  }

  /** (estimatedBytes, exactRows) of this scan AFTER file pruning by
    * `filters` — the DSv2 `SupportsReportStatistics` feed. Bytes are
    * on-disk parquet scaled by `spark.sql.sources.fileCompressionFactor`
    * (the knob Spark's own file sources honor for the columnar-on-disk vs
    * in-memory gap). None above the distributed-snapshot threshold. */
  private[sources] def scanDimensions(filters: Array[Filter],
                                      pinnedVersion: Option[Long] = None): Option[(Long, Option[Long])] =
    table.tableDimensions(pinnedVersion.orElse(resolvedVersion()),
      DeltaRelation.pruneJson(filters))
      .map { case (bytes, rows) => (DeltaRelation.scaleBytes(sqlContext, bytes), rows) }

  /** Log-derived relation size: Spark's join planner consults
    * `sizeInBytes` against `autoBroadcastJoinThreshold`, and the
    * `BaseRelation` default is `defaultSizeInBytes` ("assume huge") — so
    * without this override a kilobyte-sized dimension table stored as a
    * graft table would NEVER be auto-broadcast and every join against it
    * would shuffle both sides. At 100 TB that is the difference between a
    * map-side join and a full shuffle of the fact table. Large tables
    * (above the distributed-snapshot threshold) deliberately keep the
    * huge default — see [[graft.delta.DeltaTable.tableDimensions]]. */
  override lazy val sizeInBytes: Long =
    table.tableDimensions(resolvedVersion(), JNothing)
      .map { case (bytes, _) => DeltaRelation.scaleBytes(sqlContext, bytes) }
      .getOrElse(super.sizeInBytes)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] =
    buildScanLimited(requiredColumns, filters, None)

  /** [[buildScan]] with an optional pushed LIMIT: when no predicate exists
    * (Spark only pushes a limit past an empty filter set, and ours stays
    * conservative with the same guard), the file list is TRIMMED to the
    * log-order prefix whose exact survivor counts (`numRecords` − DV
    * cardinality) cover the limit — `SELECT * FROM t LIMIT 10` on a
    * million-file table plans a scan over one file instead of building a
    * parquet relation across all of them. Files without provable counts
    * are kept and count as zero, so the prefix never under-covers; Spark's
    * own Limit still executes on top (isPartiallyPushed). */
  private[sources] def buildScanLimited(requiredColumns: Array[String],
                                        filters: Array[Filter],
                                        limit: Option[Int],
                                        topN: Option[DeltaRelation.TopN] = None): RDD[Row] = {
    val snap = plannedSnapshot(filters, limit, topN)
    var df = table.toDF(snap)
    filters.flatMap(DeltaRelation.toColumn).foreach(c => df = df.filter(c))
    // an empty projection (COUNT(*)) still needs the row stream
    df.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }

  /** The planned file set for a scan: FILE pruning first (partition values
    * + zone-map stats via FilePruner, distributed above the table's
    * snapshot threshold — whole files skipped before Spark plans the
    * scan); an optional pushed LIMIT / ORDER-BY-LIMIT then trims the list
    * to a survivor-covering prefix / zone-map cover. Untranslatable
    * filters prune nothing and Spark re-evaluates everything, so partial
    * translation stays correct. Shared by the V1 row bridge and the
    * native V2 batch scan. */
  private[sources] def plannedSnapshot(filters: Array[Filter],
                                       limit: Option[Int],
                                       topN: Option[DeltaRelation.TopN],
                                       pinnedVersion: Option[Long] = None,
                                       claimed: Array[Filter] = Array.empty,
                                       claimedPaths: Option[Set[String]] = None): Snapshot = {
    val snapRaw = table.scanState(pinnedVersion.orElse(resolvedVersion()),
      DeltaRelation.pruneJson(filters ++ claimed))
    // CLAIMED filters were removed from Spark's post-scan residuals, so
    // the scan itself must enforce them — exactly: via the memoized
    // pushFilters-time path set (driver claim) or by re-running the
    // tri-state eval over the pruned survivors (distributed claim), both
    // against the SAME pinned version.
    val snap0 =
      if (claimed.isEmpty) snapRaw
      else snapRaw.copy(activeFiles =
        exactClaimKeep(snapRaw, claimed, claimedPaths))
    (limit, topN) match {
      case (Some(l), _) if filters.isEmpty =>
        snap0.copy(activeFiles = DeltaRelation.trimForLimit(snap0.activeFiles, l))
      case (_, Some(t)) if filters.isEmpty =>
        val kept = graft.delta.StatsAggregates.topNPrefix(
          snap0.activeFiles, t.field, snap0.partitionColumns.toSet,
          t.asc, t.nullsFirst, t.limit)
        kept.foreach(k => DeltaRelation.topNSkipped.addAndGet(
          (snap0.activeFiles.size - k.size).toLong))
        snap0.copy(activeFiles = kept.getOrElse(snap0.activeFiles))
      case _ => snap0
    }
  }

  override def toString: String = s"DeltaRelation[${table.path}]"
}

object DeltaRelation {

  /** Branch-wise disjunction encoding, shared by the sources.Filter and
    * Catalyst-expression translators: each branch's translation is
    * weaker-or-equal than the branch (conv drops what it can't express),
    * so L∨R ⇒ L'∨R' and a file is kept if ANY branch keeps it. A branch
    * that translates to NOTHING makes the whole Or vacuous
    * (true ∨ R' = true) — emit nothing and prune nothing. This is the
    * `date = X OR date = Y` backfill shape on a partitioned table. */
  private[sources] def orJson(lc: Seq[JObject], rc: Seq[JObject]): Seq[JObject] =
    if (lc.isEmpty || rc.isEmpty) Nil
    else Seq(JObject(List("$or" -> JArray(List(
      JObject(List("$and" -> JArray(lc.toList))),
      JObject(List("$and" -> JArray(rc.toList))))))))

  /** On-disk → planner bytes: scaled by the session's
    * `spark.sql.sources.fileCompressionFactor` (default 1.0), floored at
    * 1 byte so an empty-but-existing table is not mistaken for a
    * zero-cost relation by rules that special-case 0. */
  private[sources] def scaleBytes(sqlContext: SQLContext, bytes: Long): Long = {
    val factor = scala.util.Try(
      sqlContext.getConf("spark.sql.sources.fileCompressionFactor", "1.0").toDouble)
      .getOrElse(1.0)
    math.max(math.ceil(bytes * factor).toLong, 1L)
  }

  /** Pushed `ORDER BY field LIMIT limit` spec for the scan. */
  final case class TopN(field: org.apache.spark.sql.types.StructField,
                        asc: Boolean, nullsFirst: Boolean, limit: Int)

  /** Test/inspection hook: files dropped by LIMIT trimming since JVM start. */
  val limitSkipped = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test/inspection hook: files dropped by TOP-N trimming since JVM start. */
  val topNSkipped = new java.util.concurrent.atomic.AtomicLong(0)

  /** Log-order prefix of `files` whose PROVABLE survivor counts cover
    * `limit`. A file without parseable stats (or an unreadable DV
    * cardinality) is kept but contributes zero, so the prefix can only
    * over-cover, never under-cover. */
  private[sources] def trimForLimit(files: Seq[graft.delta.AddFile],
                                    limit: Int): Seq[graft.delta.AddFile] = {
    var acc = 0L
    val out = Seq.newBuilder[graft.delta.AddFile]
    var kept = 0
    val it = files.iterator
    while (it.hasNext && acc < limit) {
      val f = it.next()
      out += f
      kept += 1
      val surv: Long = f.parsedStats.map(_.numRecords) match {
        case Some(n) =>
          f.deletionVector match {
            case None => n
            case Some(dv) => dv.obj.toMap.get("cardinality") match {
              case Some(org.json4s.JInt(c)) => n - c.toLong
              case Some(org.json4s.JLong(c)) => n - c
              case _ => 0L // unknown deletions: claim nothing
            }
          }
        case None => 0L
      }
      acc += math.max(surv, 0L)
    }
    limitSkipped.addAndGet((files.size - kept).toLong)
    out.result()
  }

  /** Best-effort `sources.Filter` → `Column` translation; `None` leaves the
    * predicate to Spark's mandatory re-evaluation (correct either way —
    * translation only adds parquet-level pushdown). */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(not)
    case _ => None
  }

  /** Conjunctive Mongo-style prune filter from translatable source
    * predicates — ONLY used for conservative file skipping
    * ([[FilePruner]] keeps files on any operator/value it can't reason
    * about), never for row filtering. Timestamps/decimals are skipped:
    * their stats forms are the pruner's untrusted cases anyway. */
  def pruneJson(filters: Array[Filter]): JValue = {
    def jlit(v: Any): Option[JValue] = v match {
      case i: Int => Some(JLong(i.toLong))
      case l: Long => Some(JLong(l))
      case s: Short => Some(JLong(s.toLong))
      case b: Byte => Some(JLong(b.toLong))
      case d: Double => Some(JDouble(d))
      // Floats stay EXACT-widened (not toString-rounded): footer stats carry
      // the same widening (FooterStats.toJValue), so stats compares are
      // bit-exact, while the decimal-rendered partition path side is
      // reconciled in FilePruner (parse path as float, then widen) — fixing
      // the literal here instead would un-fix stats pruning.
      case f: Float => Some(JDouble(f.toDouble))
      case s: String => Some(JString(s))
      case b: Boolean => Some(JBool(b))
      // Date/timestamp literals reach V1 Filters as external Java types
      // (either legacy java.sql or java8 java.time, per
      // spark.sql.datetime.java8API.enabled). Encode them in the log's
      // canonical string forms — ISO date / micros-precision UTC
      // timestamp — which FilePruner.compare parses for DateType and
      // TimestampType columns. Without this, a date-range filter on a
      // 100-TB date-partitioned table prunes NOTHING at the file level.
      case d: java.sql.Date => Some(JString(d.toLocalDate.toString))
      case d: java.time.LocalDate => Some(JString(d.toString))
      case t: java.sql.Timestamp =>
        Some(JString(java.time.LocalDateTime.ofInstant(
          t.toInstant, java.time.ZoneOffset.UTC)
          .format(graft.delta.FilePruner.CanonFormat)))
      case i: java.time.Instant =>
        Some(JString(java.time.LocalDateTime.ofInstant(
          i, java.time.ZoneOffset.UTC)
          .format(graft.delta.FilePruner.CanonFormat)))
      case t: java.time.LocalDateTime =>
        Some(JString(t.format(graft.delta.FilePruner.CanonFormat)))
      case _ => None
    }
    def op(field: String, o: String, v: Any): Seq[JObject] =
      jlit(v).map(jv => JObject(List(field -> JObject(List(o -> jv))))).toSeq
    def conv(f: Filter): Seq[JObject] = f match {
      case EqualTo(a, v) => op(a, "$eq", v)
      // `<=>` IS Mongo $eq (null-safe equality), including the null literal
      case EqualNullSafe(a, null) =>
        Seq(JObject(List(a -> JObject(List("$eq" -> JNull)))))
      case EqualNullSafe(a, v) => op(a, "$eq", v)
      case GreaterThan(a, v) => op(a, "$gt", v)
      case GreaterThanOrEqual(a, v) => op(a, "$gte", v)
      case LessThan(a, v) => op(a, "$lt", v)
      case LessThanOrEqual(a, v) => op(a, "$lte", v)
      case In(a, vs) =>
        val lits = vs.toSeq.map(jlit)
        if (lits.nonEmpty && lits.forall(_.isDefined))
          Seq(JObject(List(a -> JObject(List("$in" -> JArray(lits.flatten.toList))))))
        else Nil
      // Null checks prune directly: `IS NULL` keeps only files that may
      // hold null rows (null partitions / nonzero-or-unknown null count);
      // `IS NOT NULL` drops null partitions and all-null files — the
      // shape every join key filter takes after Spark's null-safety
      // rewrites, so it matters at scale.
      case IsNull(a) => Seq(JObject(List(a -> JObject(List("$eq" -> JNull)))))
      case IsNotNull(a) => Seq(JObject(List(a -> JObject(List("$ne" -> JNull)))))
      // LIKE 'p%' prunes on untruncated string stats and partition values.
      case StringStartsWith(a, p) =>
        Seq(JObject(List(a -> JObject(List("$startsWith" -> JString(p))))))
      case And(l, r) => conv(l) ++ conv(r)
      // Disjunctions prune soundly branch-wise — see [[DeltaRelation.orJson]].
      case Or(l, r) => orJson(conv(l), conv(r))
      case _ => Nil // Not/null/string ops: no file skipping, still exact
    }
    val conjuncts = filters.toSeq.flatMap(conv)
    if (conjuncts.isEmpty) JNothing
    else JObject(List("$and" -> JArray(conjuncts.toList)))
  }

  def forParameters(sqlContext: SQLContext,
                    parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new ValidationException("graft-delta requires a path"))
    val version = parameters.get("versionasof")
      .orElse(parameters.get("versionAsOf")).map(_.toLong)
    val ts = parameters.get("timestampasof")
      .orElse(parameters.get("timestampAsOf")).map(_.toLong)
    if (version.nonEmpty && ts.nonEmpty) throw new ValidationException(
      "versionAsOf and timestampAsOf are mutually exclusive")
    val table = DeltaTable.forPath(sqlContext.sparkSession, path)
    if (table.version < 0) throw new ValidationException(
      s"$path is not a Delta table (no commits)")
    // Batch CDF (Delta parity): readChangeFeed=true + a starting version
    // or timestamp bound returns the change rows, not the table rows.
    val cdf = parameters.get("readchangefeed")
      .orElse(parameters.get("readChangeFeed")).exists(_.toBoolean)
    if (cdf) {
      if (version.nonEmpty || ts.nonEmpty) throw new ValidationException(
        "readChangeFeed cannot combine with versionAsOf/timestampAsOf; " +
          "bound the feed with startingVersion/endingVersion " +
          "or startingTimestamp/endingTimestamp")
      def opt(k: String) =
        parameters.get(k.toLowerCase).orElse(parameters.get(k))
      val sv = opt("startingVersion").map(_.toLong)
      val st = opt("startingTimestamp")
        .map(graft.streaming.DeltaStreamSource.parseTimestampMs)
      if (sv.nonEmpty && st.nonEmpty) throw new ValidationException(
        "specify either startingVersion or startingTimestamp, not both")
      val df = sv match {
        case Some(s) =>
          graft.delta.Cdc.readByVersion(table, s,
            opt("endingVersion").map(_.toLong).getOrElse(table.version))
        case None => st match {
          case Some(s) =>
            graft.delta.Cdc.readByTimestamp(table, s,
              opt("endingTimestamp")
                .map(graft.streaming.DeltaStreamSource.parseTimestampMs)
                .getOrElse(System.currentTimeMillis()))
          case None => throw new ValidationException(
            "batch readChangeFeed requires startingVersion or startingTimestamp")
        }
      }
      new CdfRelation(sqlContext, df)
    } else new DeltaRelation(sqlContext, table, version, ts)
  }

  def write(sqlContext: SQLContext, mode: SaveMode,
            parameters: Map[String, String], data: DataFrame): DeltaRelation = {
    val path = parameters.getOrElse("path",
      throw new ValidationException("graft-delta requires a path"))
    val table = DeltaTable.forPath(sqlContext.sparkSession, path)
    val exists = table.version >= 0
    val partitionBy = parameters.get("partitionby")
      .orElse(parameters.get("partitionBy"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    // Idempotent batch writes (Delta's txnAppId/txnVersion options): a
    // retried job re-running the same (appId, version) is skipped, so an
    // orchestrator can safely re-submit a failed-but-actually-committed
    // write.
    val txn = for {
      app <- parameters.get("txnappid").orElse(parameters.get("txnAppId"))
      v <- parameters.get("txnversion").orElse(parameters.get("txnVersion"))
    } yield Txn(app, v.toLong, System.currentTimeMillis())
    val alreadyApplied = txn.exists(t =>
      exists && table.metaSnapshot().transactions.getOrElse(t.appId, -1L) >= t.version)
    def put(m: String): Unit = { table.write(data, m, partitionBy, txn); () }
    if (!alreadyApplied) mode match {
      case SaveMode.Append => put("append")
      case SaveMode.Overwrite => put("overwrite")
      case SaveMode.ErrorIfExists =>
        if (exists) throw new ValidationException(
          s"$path already exists (SaveMode.ErrorIfExists)")
        put("append")
      case SaveMode.Ignore => if (!exists) put("append")
    }
    new DeltaRelation(sqlContext, table, None, None)
  }
}

/** Batch change-feed relation: the pre-built CDF frame (table columns +
  * `_change_type`/`_commit_version`/`_commit_timestamp`) served through
  * the V1 relation seam — the schema differs from the table's, so it
  * cannot ride [[DeltaRelation]] itself. */
private final class CdfRelation(
    val sqlContext: SQLContext, df: DataFrame)
  extends BaseRelation with TableScan {
  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}
