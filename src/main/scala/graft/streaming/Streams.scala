package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.delta.{Cdc, DeltaTable}

/**
 * Structured-Streaming surface. The reference's "streaming" is a
 * commit-granularity change feed plus subscriber callbacks
 * (reference: src/cdc/index.ts:1277-1327 — no watermarks or event-time
 * windows exist there). Re-expressed Spark-first:
 *
 *  - [[eventStream]]/[[windowedCounts]]: a real event-time pipeline
 *    (watermark + tumbling/sliding windows) over a parquet directory source —
 *    the north-star streaming capability the reference lacks;
 *  - [[subscribe]]: the reference's per-record subscriber re-expressed as a
 *    micro-batch `foreachBatch` over the table's change feed, with offsets
 *    advanced per batch exactly like `CDCConsumer.subscribe`.
 */
object Streams {

  /** File-source stream over a directory of parquet (schema must be given —
    * streaming sources cannot infer). */
  def eventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window counts per event type: the canonical
    * event-time aggregation (late data beyond the watermark is dropped). */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     watermark: String = "10 minutes",
                     window: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Run a streaming aggregation over a static directory to completion using
    * the memory sink. `Trigger.AvailableNow` drains all available input in
    * back-to-back micro-batches and stops — no processing-time poll intervals
    * idling between batches (a fixed 1 s trigger spent most of its wall time
    * waiting). Returns the result table registered under `name`.
    *
    * `statePartitions` pins `spark.sql.shuffle.partitions` for the query's
    * lifetime (state-store layout is fixed at first start): every stateful
    * operator commits one state store per partition per micro-batch, so
    * partition count should follow per-batch event volume, not core count —
    * a 32-partition stream-stream join over a few thousand rows spends more
    * time in store commits than in the join (observed 6.4 s → 2.7 s). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append",
                  statePartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val q: StreamingQuery = df.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally statePartitions.foreach(_ => spark.conf.set(key, old))
    drainMemorySink(spark, name)
  }

  /** Materialize a FINISHED memory-sink query's table into a standalone
    * local DataFrame, then drop the sink's temp view and unload all
    * streaming state (providers + the background maintenance thread;
    * both restart lazily on the next stateful query). A memory sink
    * already lives on the driver, so the collect adds no new scale hazard
    * — what this bounds is the sink's LIFETIME: without it every finished
    * streaming query leaves its sink rows registered forever and its
    * state-store providers under periodic background maintenance, taxing
    * whatever runs next in the same session (the round-9 bench artifact
    * showed exactly that: unrelated queries inflating when run after the
    * streaming gates). */
  def drainMemorySink(spark: SparkSession, name: String): DataFrame = {
    val sink = spark.table(name)
    val rows = java.util.Arrays.asList(sink.collect(): _*)
    val schema = sink.schema
    spark.catalog.dropTempView(name)
    org.apache.spark.sql.graft.Shims.unloadStreamingState()
    spark.createDataFrame(rows, schema)
  }

  /**
   * Subscribe to a table's change feed: every poll delivers one micro-batch
   * DataFrame of new change rows to `handler`, then commits the offset.
   * Handler failures leave the offset uncommitted so the batch redelivers —
   * at-least-once, like the reference's per-subscriber error isolation
   * (src/cdc/index.ts:1277-1327).
   */
  def subscribe(table: DeltaTable, group: String)
               (handler: DataFrame => Unit): Boolean = {
    val consumer = table.newConsumer(group)
    consumer.poll() match {
      case None => false
      case Some(batch) =>
        handler(batch)
        consumer.commit()
        true
    }
  }
}
