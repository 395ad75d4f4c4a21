package graft.streaming

import graft.SparkTestBase
import graft.delta.{Checkpoints, DeltaTable, Txn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.Files

/** The graft-delta streaming SINK: exactly-once batch commits via the
  * Delta `txn` action (replayed batches are detected and skipped). */
class DeltaSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("writeStream into a table: appends land, checkpoint restart adds no duplicates") {
    val srcDir = Files.createTempDirectory("graft-sink-src").toString
    val tblDir = Files.createTempDirectory("graft-sink-tbl").toString
    val ckpt = Files.createTempDirectory("graft-sink-ck").toString
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(tblDir)
      q.awaitTermination()
    }
    run()
    val t = DeltaTable.forPath(spark, tblDir)
    assert(t.toDF().as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b")))
    // restart with nothing new: no duplicates, no new commits beyond scaffolding
    run()
    assert(t.toDF().count() == 2)
    // new source data: only the new rows land
    Seq((3, "c")).toDF("id", "s").write.mode("append").parquet(srcDir)
    run()
    assert(DeltaTable.forPath(spark, tblDir).toDF()
      .as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("replayed batch ids are skipped: same id twice commits once") {
    val dir = Files.createTempDirectory("graft-sink-replay").toString
    val sink = new DeltaStreamSink(spark, dir,
      Map("txnAppId" -> "appX"), Nil, OutputMode.Append())
    sink.addBatch(0, Seq((1, "a")).toDF("id", "s"))
    // at-least-once engine replays batch 0 after a "crash": must be a no-op
    sink.addBatch(0, Seq((99, "dup")).toDF("id", "s"))
    sink.addBatch(1, Seq((2, "b")).toDF("id", "s"))
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF().as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b")))
    assert(t.lastTransactionVersion("appX").contains(1L))
  }

  test("Complete output mode overwrites the table each batch") {
    val dir = Files.createTempDirectory("graft-sink-complete").toString
    val sink = new DeltaStreamSink(spark, dir,
      Map("txnAppId" -> "aggQ"), Nil, OutputMode.Complete())
    sink.addBatch(0, Seq(("click", 10L)).toDF("k", "n"))
    sink.addBatch(1, Seq(("click", 25L), ("view", 3L)).toDF("k", "n"))
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF().as[(String, Long)].collect().toSet ==
      Set(("click", 25L), ("view", 3L)))
  }

  test("racing writers of the same (appId, version) commit exactly once") {
    val dir = Files.createTempDirectory("graft-sink-race").toString
    val t = DeltaTable.forPath(spark, dir)
    t.write(Seq((0, "seed")).toDF("id", "s")) // v0: table exists
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val n = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val results = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          start.await()
          // each thread tries to commit ITS OWN rows as transaction 1
          t.write(Seq((100 + i, s"w$i")).toDF("id", "s"),
            txn = Some(Txn("race-app", 1L)))
        }
      })
    }
    start.countDown()
    val versions = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // exactly one thread's row landed; the rest returned the winner's version
    val rows = t.toDF().as[(Int, String)].collect().toSet
    assert(rows.size == 2, s"expected seed + exactly one winner row, got $rows")
    assert(rows.contains((0, "seed")))
    assert(t.lastTransactionVersion("race-app").contains(1L))
    assert(versions.toSet.size <= 2) // winner's commit version, losers echo it
    // losers' staged files were cleaned up: active files == 2
    assert(t.snapshot().activeFiles.size == 2)
  }

  test("txn state survives checkpoints and log cleanup") {
    val dir = Files.createTempDirectory("graft-sink-txn").toString
    val t = DeltaTable.forPath(spark, dir)
    t.checkpointInterval = 2
    t.write(Seq((1, "a")).toDF("id", "s"), txn = Some(Txn("appY", 7L)))
    (0 until 8).foreach(i => t.write(Seq((10 + i, "x")).toDF("id", "s")))
    assert(Checkpoints.listCheckpointVersions(t.log).nonEmpty)
    t.cleanupLog(keepCheckpoints = 2)
    // a fresh reader reconstructs the txn map from the checkpoint
    val t2 = DeltaTable.forPath(spark, dir)
    assert(t2.lastTransactionVersion("appY").contains(7L))
    assert(t2.toDF().count() == 9)
  }
}
