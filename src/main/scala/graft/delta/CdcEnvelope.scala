package graft.delta

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Debezium-style CDC envelope (reference: src/cdc/index.ts:38-93 — CDCRecord,
 * CDCSource; producer 305-453; consumer filters 607-833).
 *
 * Record shape: `_id` (entity id), `_seq` (monotonic sequence), `_op`
 * (c/u/d/r), `_before`/`_after` (JSON document state, null for create/delete
 * respectively), `_ts` (nanoseconds), `_source` (system/database/collection/
 * partition/serverId), `_txn` (optional transaction id).
 *
 * Two construction paths, matching how this scales:
 *  - [[CdcProducer]]: driver-side record-at-a-time emission with an atomic
 *    sequence counter — reference-parity for single-writer feeds;
 *  - [[CdcEnvelope.fromOps]]/[[CdcEnvelope.snapshot]]: DataFrame
 *    constructors where `_seq` is dense PER SOURCE PARTITION (window
 *    row_number over an explicit order within `partitionCol`) — Kafka-style
 *    per-partition offsets. A single global dense sequence would force a
 *    one-task window at 100 TB; partitioned sequences shuffle once on the
 *    partition key and scale.
 */
final case class CdcSource(
    system: String = "graft",
    database: Option[String] = None,
    collection: Option[String] = None,
    partition: Option[Int] = None,
    serverId: Option[String] = None)

final case class CdcRecord(
    _id: String,
    _seq: Long,
    _op: String,
    _before: Option[String],
    _after: Option[String],
    _ts: Long,
    _source: CdcSource,
    _txn: Option[String])

/** Driver-side producer with a monotonic sequence (reference:
  * CDCProducer, src/cdc/index.ts:305-453). Thread-safe. */
final class CdcProducer(source: CdcSource = CdcSource(),
                        nowNanos: () => Long = () => System.currentTimeMillis() * 1000000L) {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  def getSequence: Long = seq.get()
  def resetSequence(to: Long = 0L): Unit = seq.set(to)

  def emit(op: String, id: String, before: Option[String], after: Option[String],
           txn: Option[String] = None): CdcRecord = {
    require(CdcEnvelope.Ops(op), s"unknown CDC op '$op' (expected c/u/d/r)")
    CdcRecord(id, seq.getAndIncrement(), op, before, after, nowNanos(), source, txn)
  }

  def create(id: String, data: String, txn: Option[String] = None): CdcRecord =
    emit("c", id, None, Some(data), txn)
  def update(id: String, before: String, after: String, txn: Option[String] = None): CdcRecord =
    emit("u", id, Some(before), Some(after), txn)
  def delete(id: String, before: String, txn: Option[String] = None): CdcRecord =
    emit("d", id, Some(before), None, txn)
  def snapshot(records: Seq[(String, String)]): Seq[CdcRecord] =
    records.map { case (id, data) => emit("r", id, None, Some(data)) }

  def toDF(spark: SparkSession, records: Seq[CdcRecord]): DataFrame =
    spark.createDataset(records)(Encoders.product[CdcRecord]).toDF()
}

object CdcEnvelope {

  val Ops: Set[String] = Set("c", "u", "d", "r")

  /**
   * Distributed envelope constructor: stamps each change row with the
   * envelope columns. `_seq` is dense from `baseSeq` within each value of
   * `partitionCol` (ordered by `orderBy`) — the partition id is recorded in
   * `_source.partition`, so (partition, seq) is a total ordering per shard
   * exactly like a Kafka (partition, offset) pair.
   *
   * `beforeJson`/`afterJson` are Column expressions producing the JSON state
   * (e.g. `to_json(struct(...))`), or null literals for create/delete.
   */
  def fromOps(df: DataFrame, idCol: Column, opCol: Column,
              beforeJson: Column, afterJson: Column,
              orderBy: Seq[Column], partitionCol: Column = lit(0),
              source: CdcSource = CdcSource(), tsNanos: Column = lit(null),
              txn: Column = lit(null), baseSeq: Long = 0L): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(orderBy: _*)
    val ts = coalesce(tsNanos.cast("long"),
      (unix_micros(current_timestamp()) * 1000L))
    df.select(
      idCol.cast("string").as("_id"),
      (row_number().over(w).cast("long") - 1L + baseSeq).as("_seq"),
      opCol.cast("string").as("_op"),
      beforeJson.cast("string").as("_before"),
      afterJson.cast("string").as("_after"),
      ts.as("_ts"),
      struct(
        lit(source.system).as("system"),
        lit(source.database.orNull).cast("string").as("database"),
        lit(source.collection.orNull).cast("string").as("collection"),
        partitionCol.cast("int").as("partition"),
        lit(source.serverId.orNull).cast("string").as("serverId")).as("_source"),
      txn.cast("string").as("_txn"))
  }

  /** Bulk snapshot envelope (`_op = 'r'`, `_before` null) — reference
    * CDCProducer.snapshot (src/cdc/index.ts:430-453). */
  def snapshot(df: DataFrame, idCol: Column, afterJson: Column,
               orderBy: Seq[Column], partitionCol: Column = lit(0),
               source: CdcSource = CdcSource(), tsNanos: Column = lit(null),
               baseSeq: Long = 0L): DataFrame =
    fromOps(df, idCol, lit("r"), lit(null), afterJson, orderBy, partitionCol,
      source, tsNanos, lit(null), baseSeq)

  /** Consumer-side filters (reference: CDCConsumer.process,
    * src/cdc/index.ts:800-833): keep only the given ops, records at or after
    * `fromSeq`, and records at or after `fromTimestampNanos`. Pure Column
    * predicates — pushdown-friendly, no driver materialization. */
  def consumerFilter(envelope: DataFrame,
                     operations: Option[Set[String]] = None,
                     fromSeq: Option[Long] = None,
                     fromTimestampNanos: Option[Long] = None): DataFrame = {
    var out = envelope
    operations.foreach(ops => out = out.filter(col("_op").isin(ops.toSeq: _*)))
    fromSeq.foreach(s => out = out.filter(col("_seq") >= s))
    fromTimestampNanos.foreach(t => out = out.filter(col("_ts") >= t))
    out
  }
}

/**
 * Multi-subscriber dispatcher with per-subscriber error isolation
 * (reference: notifySubscribers, src/cdc/index.ts:1299-1327; auto-commit
 * 820-833). Each poll delivers the new change batch to EVERY handler; one
 * handler's failure is caught, routed to its `onError` (whose own failures
 * are also swallowed), and does not starve the others. The offset advances
 * when at least one handler exists and the batch was delivered — at-least-
 * once per subscriber, like the reference.
 */
final class CdcSubscription(table: DeltaTable, group: String,
                            autoCommitIntervalMs: Long = 0L) {
  private case class Entry(handler: DataFrame => Unit,
                           onError: (Throwable, DataFrame) => Unit)
  private val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
  private val consumer = table.newConsumer(group)
  private var lastCommitMs = 0L

  def subscriberCount: Int = entries.size

  /** Register a handler; returns an unsubscribe thunk. */
  def subscribe(handler: DataFrame => Unit,
                onError: (Throwable, DataFrame) => Unit = (_, _) => ()): () => Unit = {
    val e = Entry(handler, onError)
    entries.synchronized { entries += e }
    () => entries.synchronized { entries -= e; () }
  }

  /** Poll once; deliver to all subscribers; commit per the auto-commit
    * interval (0 = commit every batch). Returns true when a batch was
    * delivered. */
  def pollOnce(): Boolean = consumer.poll() match {
    case None => false
    case Some(batch) =>
      val snapshot = entries.synchronized { entries.toSeq }
      var delivered = 0
      snapshot.foreach { e =>
        try { e.handler(batch); delivered += 1 }
        catch {
          case err: Throwable =>
            Logging.logger.error(s"[graft.Cdc] subscriber error in group '$group': $err")
            try e.onError(err, batch)
            catch { case cb: Throwable =>
              Logging.logger.error(s"[graft.Cdc] onError callback threw: $cb")
            }
        }
      }
      // At-least-once: the offset may only advance when the batch actually
      // reached a handler. When EVERY handler failed, the offset stays put so
      // the next poll redelivers the batch — committing here would silently
      // downgrade the documented guarantee to at-most-once.
      val anyDelivered = snapshot.isEmpty || delivered > 0
      val now = System.currentTimeMillis()
      if (anyDelivered &&
          (autoCommitIntervalMs <= 0L || now - lastCommitMs >= autoCommitIntervalMs)) {
        consumer.commit()
        lastCommitMs = now
      }
      true
  }

  /** Drain everything currently available (bounded polls). */
  def drain(maxPolls: Int = 100): Int = {
    var n = 0
    while (n < maxPolls && pollOnce()) n += 1
    n
  }
}
