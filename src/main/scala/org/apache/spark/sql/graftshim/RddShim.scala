package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic

/** Bridge for pinning ONE physical plan under a two-phase computation —
  * `internalCreateDataFrame` is `private[sql]` (same shim pattern as
  * [[ColumnShim]]/[[StreamShim]]). */
object RddShim {

  /** Execute `df`'s plan once into an InternalRow RDD and re-wrap that SAME
    * RDD as a DataFrame. A pass over the returned RDD (e.g. a per-partition
    * count) and a later pass over the returned DataFrame share shuffle
    * outputs and are guaranteed the same partition layout — the property a
    * partition-offset allocation needs, which two independent executions of
    * the same logical plan (AQE re-coalescing, nondeterministic sources)
    * would not give. Rows are defensively copied on the DataFrame side:
    * downstream operators that buffer (the partitioned-write sorter) must
    * not capture the scan's reused row. */
  def pin(df: DataFrame): (RDD[InternalRow], DataFrame) = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd
    (rdd, ds.sparkSession.internalCreateDataFrame(rdd.map(_.copy()), ds.schema))
  }

  /** [[pin]] with the computed rows PERSISTED (serialized, memory with
    * disk spill): the first pass over the returned RDD materializes the
    * blocks and every later pass — in particular the identity-fill write
    * job — reads them back instead of re-executing the plan. For a
    * shuffle-free ingest (the common `INSERT INTO ... SELECT` over a
    * source scan) this halves source-read bytes: one scan plus one
    * local-cache read, instead of the two full scans the plain pin pays
    * (RDD lineage only reuses SHUFFLE outputs across jobs, not scans).
    * The caller MUST invoke the returned release after the consuming job
    * finishes — blocks would otherwise sit until the RDD is GC'd and the
    * ContextCleaner notices. Rows are copied BEFORE the cache (the scan
    * reuses one mutable row; caching references to it would corrupt every
    * block), which also serves the buffering-downstream-operator copy the
    * plain pin makes. */
  def pinPersisted(df: DataFrame): (RDD[InternalRow], DataFrame, () => Unit) = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val cached = ds.queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    (cached, ds.sparkSession.internalCreateDataFrame(cached, ds.schema),
      () => { cached.unpersist(blocking = false); () })
  }
}
