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
}
