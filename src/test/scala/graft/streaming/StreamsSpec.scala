package graft.streaming

import graft.SparkTestBase
import graft.delta.{Cdc, DeltaTable}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  test("watermarked windowed aggregation over a parquet stream (memory sink)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // Instant → TimestampType (watermarks reject TIMESTAMP_NTZ event time).
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 600).map { i =>
      (i.toLong, base.plusSeconds(i * 10), if (i % 2 == 0) "click" else "view", i.toDouble)
    }
    rows.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = Streams.eventStream(spark, dir, schema)
    assert(stream.isStreaming)
    val agg = Streams.windowedCounts(stream, watermark = "1 minute", window = "5 minutes")
    // complete mode: memory sink holds the full aggregate state
    val out = Streams.runToMemory(agg, "wincounts", outputMode = "complete")
    // 600 events * 10s = 100 min → 20 windows × 2 types
    assert(out.count() == 40)
    val total = out.agg(sum("n")).head().getLong(0)
    assert(total == 600)
  }

  test("change-feed subscribe delivers batches and advances offsets") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-sub").toString)
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.enableCDC()
    t.write(Seq((2, "b")).toDF("id", "s"))

    var seen = Seq.empty[Long]
    assert(Streams.subscribe(t, "g")(b =>
      seen = b.select("id").as[Long].collect().toSeq))
    assert(seen == Seq(2L))
    // no new data → no delivery
    assert(!Streams.subscribe(t, "g")(_ => fail("should not deliver")))
    // handler failure leaves offset uncommitted → redelivery
    t.write(Seq((3, "c")).toDF("id", "s"))
    intercept[RuntimeException] {
      Streams.subscribe(t, "g")(_ => throw new RuntimeException("boom"))
    }
    assert(Streams.subscribe(t, "g")(b =>
      seen = b.select("id").as[Long].collect().toSeq))
    assert(seen == Seq(3L))
  }
}
