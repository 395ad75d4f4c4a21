package graft.delta

import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Table state at a version: active files + metadata + protocol
 * (reference: src/delta/types.ts:142-147), reconstructed by log replay
 * (src/delta/table.ts:557-642).
 */
final case class Snapshot(
    version: Long,
    metadata: Option[TableMetadata],
    protocol: Option[Protocol],
    activeFiles: Seq[AddFile],
    tombstones: Seq[RemoveFile],
    transactions: Map[String, Long] = Map.empty) {

  def schema: StructType = metadata
    .map(m => DataType.fromJson(m.schemaString).asInstanceOf[StructType])
    .getOrElse(StructType(Nil))

  def partitionColumns: Seq[String] = metadata.map(_.partitionColumns).getOrElse(Nil)

  def configuration: Map[String, String] = metadata.map(_.configuration).getOrElse(Map.empty)
}

object Snapshot {

  val empty: Snapshot = Snapshot(-1L, None, None, Nil, Nil)

  /**
   * Replay commits in order onto `base`. Reconciliation rules
   * (reference: src/delta/table.ts:602-639): actions apply sequentially, so
   * within a commit a remove cancels a prior add of the same path, a later
   * add reinstates it, and the last add for a path wins. Latest
   * metaData/protocol win across commits. Tombstones accumulate for vacuum.
   */
  def replay(base: Snapshot, commits: Iterator[(Long, Seq[Action])]): Snapshot = {
    var version = base.version
    var metadata = base.metadata
    var protocol = base.protocol
    val files = scala.collection.mutable.LinkedHashMap.from(
      base.activeFiles.map(f => f.path -> f))
    val tombstones = scala.collection.mutable.LinkedHashMap.from(
      base.tombstones.map(r => r.path -> r))
    val txns = scala.collection.mutable.LinkedHashMap.from(base.transactions)

    commits.foreach { case (v, actions) =>
      version = v
      actions.foreach {
        case a: AddFile =>
          files.put(a.path, a)
          tombstones.remove(a.path)
        case r: RemoveFile =>
          files.remove(r.path)
          tombstones.put(r.path, r)
        case m: TableMetadata => metadata = Some(m)
        case p: Protocol => protocol = Some(p)
        case t: Txn => txns.put(t.appId, t.version)
        case _: CommitInfo => ()
      }
    }
    Snapshot(version, metadata, protocol, files.values.toSeq,
      tombstones.values.toSeq, txns.toMap)
  }
}
