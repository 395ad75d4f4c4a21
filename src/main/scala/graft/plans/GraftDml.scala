package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Cast, EqualTo, Expression, SubqueryExpression, And => CAnd}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Shims

import graft.delta.{DeltaTable, Merge, ValidationException}
import graft.sources.GraftTable

/**
 * Planner strategy that lowers SQL DML over [[graft.sources.GraftCatalog]]
 * tables onto the existing transactional machinery:
 *
 *  - `DELETE FROM t WHERE c`        → [[DeltaTable.delete(condition:*]]
 *    (or the DV path under `spark.graft.sql.dml.mor=true`)
 *  - `UPDATE t SET a=e WHERE c`     → [[DeltaTable.update(condition:*]]
 *  - `MERGE INTO t USING s ON cond` → [[Merge.executeClauses]]
 *    (key-equality `ON`) or [[Merge.executeCondition]] (theta)
 *
 * Spark itself plans none of these for plain DSv2 tables (it requires the
 * row-level-operations API); `experimental.extraStrategies` run BEFORE the
 * built-in strategies, so this intercepts the commands Spark would
 * otherwise reject — the same interception point, one layer later, that
 * Delta-style engines use via session-extension rules. Register with
 * [[GraftSql.ensure]] (runtime) or [[GraftSparkSessionExtension]]
 * (`spark.sql.extensions`).
 *
 * Supported MERGE shapes on the key-equality path: any number of
 * conditional `WHEN MATCHED THEN UPDATE SET * / SET c=e / DELETE` clauses
 * (first-true-wins), one optionally-conditional name-aligned
 * `WHEN NOT MATCHED THEN INSERT`, and `WHEN NOT MATCHED BY SOURCE THEN
 * UPDATE/DELETE`. The theta path carries one unconditional matched
 * clause. Refused with clear errors: subqueries in conditions,
 * non-name-aligned inserts, `WITH SCHEMA EVOLUTION`. Zero-match
 * DELETE/UPDATE is a SQL no-op, not the programmatic API's error.
 */
final class GraftDmlStrategy(spark: SparkSession) extends SparkStrategy {

  /** `spark.graft.sql.dml.mor=true` routes SQL DELETE/UPDATE through the
    * deletion-vector (merge-on-read) paths — zero data files rewritten,
    * the right mode when a trickle of DML lands on huge files. Default is
    * copy-on-write, which reclaims storage (Delta's own guidance). */
  private def morMode: Boolean =
    spark.conf.getOption("spark.graft.sql.dml.mor").exists(_.toBoolean)

  /** The DML cores throw on zero matched rows (reference-API parity, the
    * d-gates pin it); SQL semantics say 0 affected rows is a SUCCESS —
    * absorb exactly that error here. */
  private def noopOnNoMatch(body: => Unit): Unit =
    try body catch {
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.endsWith("matched no rows") => ()
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeleteFromTable(GraftRelation(t, out), condition) =>
      exec(plan.nodeName) {
        val cond = targetColumn(condition, out)
        noopOnNoMatch { if (morMode) t.deleteWithDV(cond) else t.delete(cond); () }
      }
    case UpdateTable(GraftRelation(t, out), assignments, condition) =>
      exec(plan.nodeName) {
        val cond = condition.map(targetColumn(_, out))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        val set = assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new ValidationException(
              s"UPDATE of a non-column target is not supported: $other")
          }
          name -> targetColumn(a.value, out)
        }
        noopOnNoMatch { if (morMode) t.updateWithDV(cond, set) else t.update(cond, set); () }
      }
    case m @ MergeIntoTable(GraftRelation(t, targetOut), source, cond,
        matchedActions, notMatchedActions, notMatchedBySourceActions, _) =>
      exec(plan.nodeName) {
        // refuse rather than silently align-to-target what the user asked
        // to evolve
        if (m.withSchemaEvolution) throw new ValidationException(
          "MERGE ... WITH SCHEMA EVOLUTION is not supported")
        runMerge(t, targetOut, source, cond, matchedActions,
          notMatchedActions, notMatchedBySourceActions)
      }
    case _ => Nil
  }

  private def exec(name: String)(body: => Unit): Seq[SparkPlan] =
    Seq(GraftDmlExec(name, spark, () => body))

  /** Rebind resolved target attributes to plain names so the Column
    * resolves against the table's own scan inside the DML machinery. */
  private def targetColumn(e: Expression, out: AttributeSet): Column = {
    refuseSubqueries(e)
    Shims.column(e.transform {
      case a: AttributeReference if out.contains(a) =>
        UnresolvedAttribute.quoted(a.name)
    })
  }

  private def refuseSubqueries(e: Expression): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new ValidationException(
        "subqueries in DML conditions are not supported")

  // ---- MERGE lowering ------------------------------------------------------

  private def runMerge(t: DeltaTable, targetOut: AttributeSet,
                       source: LogicalPlan, cond: Expression,
                       matchedActions: Seq[MergeAction],
                       notMatchedActions: Seq[MergeAction],
                       notMatchedBySourceActions: Seq[MergeAction]): Unit = {
    refuseSubqueries(cond)
    val sourceOut = source.outputSet
    val srcDf = Shims.ofRows(spark, source)

    /** NOT-MATCHED condition environment: plain source column names. */
    def sourceColumn(e: Expression): Column = {
      refuseSubqueries(e)
      Shims.column(e.transform {
        case a: AttributeReference if sourceOut.contains(a) =>
          UnresolvedAttribute.quoted(a.name)
      })
    }
    def requireAligned(assigns: Seq[Assignment]): Unit = {
      val aligned = assigns.forall { a =>
        (a.key, stripCast(a.value)) match {
          case (k: AttributeReference, v: AttributeReference) =>
            k.name == v.name && sourceOut.contains(v)
          case _ => false
        }
      }
      if (!aligned) throw new ValidationException(
        "only name-aligned INSERT (INSERT * / INSERT (c…) VALUES (s.c…)) is supported")
    }
    // INSERT side: absent, or ONE (optionally conditional) name-aligned insert.
    val insert: Option[Option[Column]] = notMatchedActions match {
      case Seq() => None
      case Seq(InsertStarAction(c)) => Some(c.map(sourceColumn))
      case Seq(InsertAction(c, assigns)) =>
        requireAligned(assigns)
        Some(c.map(sourceColumn))
      case other => throw new ValidationException(
        s"at most one NOT MATCHED action is supported: $other")
    }
    val insertUnmatched = insert.isDefined

    // MATCHED side → MergeAction.
    def updateSet(assigns: Seq[Assignment]): Merge.MergeAction = {
      // UPDATE SET * resolves to one assignment per target column, each
      // `t.c := s.c` — detect and use the cheaper UpdateAll path
      val starLike = assigns.forall { a =>
        (a.key, stripCast(a.value)) match {
          case (k: AttributeReference, v: AttributeReference) =>
            k.name == v.name && sourceOut.contains(v)
          case _ => false
        }
      }
      if (starLike && assigns.nonEmpty) Merge.MergeAction.UpdateAll
      else Merge.MergeAction.UpdateSet(assigns.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new ValidationException(
            s"UPDATE of a non-column target is not supported: $other")
        }
        name -> mergeValueColumn(a.value, targetOut, sourceOut)
      }.toMap)
    }
    // MATCHED side: any number of (optionally conditional) clauses, tried
    // in order, first-true-wins — SQL MERGE semantics, carried by
    // [[Merge.executeClauses]]. Clause conditions live in the matched-row
    // env (target cols + __src struct), same as UPDATE SET values.
    def mergeCond(e: Expression): Column = mergeValueColumn(e, targetOut, sourceOut)
    val clauses: Seq[Merge.MergeClause] = matchedActions.map {
      case DeleteAction(c) =>
        Merge.MergeClause(c.map(mergeCond), Merge.MergeAction.Delete)
      case UpdateStarAction(c) =>
        Merge.MergeClause(c.map(mergeCond), Merge.MergeAction.UpdateAll)
      case UpdateAction(c, assigns, _) =>
        Merge.MergeClause(c.map(mergeCond), updateSet(assigns))
      case other => throw new ValidationException(
        s"unsupported MATCHED action: $other")
    }

    // NOT MATCHED BY SOURCE: target-side clauses (DELETE / UPDATE SET with
    // target-only expressions), carried on the same executeClauses chain.
    val nmsClauses: Seq[Merge.MergeClause] = notMatchedBySourceActions.map {
      case DeleteAction(c) =>
        Merge.MergeClause(c.map(mergeCond), Merge.MergeAction.Delete)
      case UpdateAction(c, assigns, _) =>
        Merge.MergeClause(c.map(mergeCond), updateSet(assigns))
      case other => throw new ValidationException(
        s"unsupported NOT MATCHED BY SOURCE action: $other")
    }

    val keys = equiKeys(cond, targetOut, sourceOut)
    if (nmsClauses.nonEmpty && keys.isEmpty) throw new ValidationException(
      "NOT MATCHED BY SOURCE requires an equality ON condition")
    if (clauses.isEmpty && nmsClauses.nonEmpty) {
      val ks = keys.get
      Merge.executeClauses(t, srcDf, ks, Nil, insert, nmsClauses)
      ()
    } else if (clauses.isEmpty) {
      // insert-only MERGE: executeClauses with no matched clauses = the
      // anti-join + append, same atomic commit path
      if (!insertUnmatched) throw new ValidationException(
        "MERGE with no actions is a no-op; refusing")
      val ks = keys.getOrElse(throw new ValidationException(
        "insert-only MERGE requires an equality ON condition"))
      Merge.executeClauses(t, srcDf, ks, Nil, insert)
      ()
    } else keys match {
      case Some(ks) =>
        // the MoR twin exists for the single-unconditional-clause shape;
        // clause chains stay CoW (no DV-mask form for partial rewrites)
        (clauses, nmsClauses) match {
          case (Seq(Merge.MergeClause(None, action)), Nil)
              if morMode && insert.forall(_.isEmpty) =>
            Merge.executeMoR(t, srcDf, ks, action, insertUnmatched)
          case _ =>
            Merge.executeClauses(t, srcDf, ks, clauses, insert, nmsClauses)
        }
        ()
      case None =>
        // theta path: single unconditional clause only
        clauses match {
          case Seq(Merge.MergeClause(None, action)) =>
            Merge.executeCondition(t, srcDf,
              aliasedCondition(cond, targetOut, sourceOut), action, insertUnmatched)
            ()
          case _ => throw new ValidationException(
            "conditional/multiple MATCHED clauses require an equality ON condition")
        }
    }
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, _, _, _) => stripCast(inner)
    case _ => e
  }

  /** `ON` conditions that are pure conjunctions of same-name
    * target-column = source-column equalities → key-column list for the
    * shuffle-free-resolution key path; anything else → None (theta path). */
  private def equiKeys(cond: Expression, targetOut: AttributeSet,
                       sourceOut: AttributeSet): Option[Seq[String]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    // The analyzer wraps type-coerced keys in casts (BIGINT target vs INT
    // source literal) — strip them: our key join re-coerces identically.
    val keys = split(cond).map(e => (e match {
      case EqualTo(l, r) => Some((stripCast(l), stripCast(r)))
      case _ => None
    }) match {
      case Some((a: AttributeReference, b: AttributeReference))
          if targetOut.contains(a) && sourceOut.contains(b) && a.name == b.name =>
        Some(a.name)
      case Some((b: AttributeReference, a: AttributeReference))
          if targetOut.contains(a) && sourceOut.contains(b) && a.name == b.name =>
        Some(a.name)
      case _ => None
    })
    if (keys.nonEmpty && keys.forall(_.isDefined)) Some(keys.flatten.distinct)
    else None
  }

  /** Rebind a theta `ON` condition to the `t`/`s` aliases
    * [[Merge.executeCondition]] joins under. */
  private def aliasedCondition(e: Expression, targetOut: AttributeSet,
                               sourceOut: AttributeSet): Column =
    Shims.column(e.transform {
      case a: AttributeReference if targetOut.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sourceOut.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
    })

  /** Rebind a matched-UPDATE assignment value for
    * [[Merge.resolveMatched]]'s environment: target columns by plain name,
    * source columns through the carried `__src` struct. */
  private def mergeValueColumn(e: Expression, targetOut: AttributeSet,
                               sourceOut: AttributeSet): Column = {
    refuseSubqueries(e)
    Shims.column(e.transform {
      case a: AttributeReference if sourceOut.contains(a) =>
        UnresolvedAttribute(Seq("__src", a.name))
      case a: AttributeReference if targetOut.contains(a) =>
        UnresolvedAttribute.quoted(a.name)
    })
  }
}

/** Extractor: the DSv2 relation (bare or scan-wrapped) over a graft table. */
private object GraftRelation {
  def unapply(plan: LogicalPlan): Option[(DeltaTable, AttributeSet)] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some((g.delta, r.outputSet))
      case _ => None
    }
    case s: DataSourceV2ScanRelation => s.relation.table match {
      case g: GraftTable => Some((g.delta, s.outputSet))
      case _ => None
    }
    case SubqueryAlias(_, child) => unapply(child)
    case _ => None
  }
}

/** Leaf node that runs the side effect once (eager command execution calls
  * `executeCollect`); models Spark's own V2CommandExec. */
final case class GraftDmlExec(opName: String,
                              @transient spark: SparkSession,
                              @transient body: () => Unit)
  extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  @transient private lazy val result: Array[InternalRow] = {
    body()
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = result

  override protected def doExecute(): RDD[InternalRow] =
    spark.sparkContext.parallelize(result.toIndexedSeq, 1)

  override def simpleString(maxFields: Int): String = s"GraftDmlExec($opName)"
}

/**
 * Session wiring for the SQL surface. Two routes:
 *  - at session BUILD time: `spark.sql.extensions=graft.plans.GraftSparkSessionExtension`
 *  - on a LIVE session: [[GraftSql.ensure]] (idempotent) — registers the
 *    `graft` catalog over a process-lifetime warehouse and injects the DML
 *    strategy via `experimental.extraStrategies`.
 */
object GraftSql {
  val CatalogName = "graft"

  /** The session's registered warehouse dir, if [[ensure]] has run. */
  def warehousePath(spark: SparkSession): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$CatalogName.warehouse")

  /** `'ns.tbl'` (warehouse-relative) or a raw `/path` / `scheme://path`. */
  private def resolveTableRef(spark: SparkSession, ref: String): String =
    if (ref.contains("/")) ref
    else warehousePath(spark) match {
      case Some(wh) => (wh +: ref.split('.').toSeq).mkString("/")
      case None => throw new graft.delta.ValidationException(
        s"no graft warehouse registered; pass a path instead of '$ref'")
    }

  private def litString(e: org.apache.spark.sql.catalyst.expressions.Expression,
                        what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case other => throw new graft.delta.ValidationException(
      s"$what must be a literal, got $other")
  }

  private def litLong(e: org.apache.spark.sql.catalyst.expressions.Expression,
                      what: String): Long =
    try litString(e, what).toLong
    catch {
      case _: NumberFormatException =>
        throw new graft.delta.ValidationException(s"$what must be an integer")
    }

  /** SQL table functions over the change feed and the commit history —
    * Delta's `table_changes(...)` / `DESCRIBE HISTORY` equivalents:
    * {{{
    *   SELECT * FROM graft_table_changes('ns.tbl', 2, 3)
    *   SELECT * FROM graft_history('ns.tbl')
    * }}}
    * Registered by [[ensure]]; table refs resolve against the session's
    * warehouse (or pass an absolute path). */
  private def registerTableFunctions(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.Shims.registerTableFunction(spark,
      "graft_table_changes",
      "graft_table_changes(table, startVersion, endVersion) - change feed rows") { args =>
      if (args.size != 3) throw new graft.delta.ValidationException(
        "graft_table_changes(table, startVersion, endVersion)")
      val path = resolveTableRef(spark, litString(args.head, "table"))
      val t = DeltaTable.forPath(spark, path)
      t.changes(litLong(args(1), "startVersion"), litLong(args(2), "endVersion"))
        .queryExecution.analyzed
    }
    org.apache.spark.sql.graft.Shims.registerTableFunction(spark,
      "graft_history", "graft_history(table) - commit history") { args =>
      if (args.size != 1) throw new graft.delta.ValidationException(
        "graft_history(table)")
      val path = resolveTableRef(spark, litString(args.head, "table"))
      val t = DeltaTable.forPath(spark, path)
      import spark.implicits._
      t.describeHistory().map { case (v, ts, op, params) => (v, ts, op, params) }
        .toDF("version", "timestamp_ms", "operation", "parameters")
        .queryExecution.analyzed
    }
    // Maintenance verbs for SQL-only users — the TVF analog of Delta's
    // VACUUM / OPTIMIZE statements (which need a parser extension Spark
    // only applies at session build; a table function works on any
    // session). The side effect runs at RESOLUTION and the returned
    // single-row metrics are what the query scans.
    org.apache.spark.sql.graft.Shims.registerTableFunction(spark,
      "graft_vacuum",
      "graft_vacuum(table[, retentionHours]) - reclaim unreferenced files") { args =>
      if (args.isEmpty || args.size > 2) throw new graft.delta.ValidationException(
        "graft_vacuum(table[, retentionHours])")
      val path = resolveTableRef(spark, litString(args.head, "table"))
      val retention = args.lift(1).map(litString(_, "retentionHours").toDouble)
        .getOrElse(168.0)
      val t = DeltaTable.forPath(spark, path)
      val r = graft.delta.Maintenance.vacuum(t, retention)
      import spark.implicits._
      Seq((r.filesDeleted, r.bytesFreed))
        .toDF("files_deleted", "bytes_freed")
        .queryExecution.analyzed
    }
    org.apache.spark.sql.graft.Shims.registerTableFunction(spark,
      "graft_compact", "graft_compact(table) - bin-pack small files") { args =>
      if (args.size != 1) throw new graft.delta.ValidationException(
        "graft_compact(table)")
      val path = resolveTableRef(spark, litString(args.head, "table"))
      val t = DeltaTable.forPath(spark, path)
      val r = graft.delta.Maintenance.compact(t,
        graft.delta.Maintenance.CompactionConfig(minFilesToCompact = 2))
      import spark.implicits._
      Seq((r.filesCompacted, r.filesCreated))
        .toDF("files_compacted", "files_created")
        .queryExecution.analyzed
    }
  }

  /** Idempotently enable the catalog + SQL DML on a live session; returns
    * the catalog name. `warehouse` overrides the default temp-dir
    * warehouse (first caller wins for the session). */
  def ensure(spark: SparkSession, warehouse: Option[String] = None): String =
    synchronized {
      val key = s"spark.sql.catalog.$CatalogName"
      if (spark.conf.getOption(key).isEmpty) {
        val wh = warehouse.getOrElse {
          val d = java.nio.file.Files
            .createTempDirectory("graft-sql-warehouse").toString
          graft.TempDirs.deleteOnExit(d)
          d
        }
        spark.conf.set(key, classOf[graft.sources.GraftCatalog].getName)
        spark.conf.set(s"$key.warehouse", wh)
      }
      if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[GraftDmlStrategy])) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ new GraftDmlStrategy(spark)
        registerTableFunctions(spark)
      }
      CatalogName
    }
}

/** `spark.sql.extensions` entry point (build-time route). */
class GraftSparkSessionExtension
  extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(session => new GraftDmlStrategy(session))
}
