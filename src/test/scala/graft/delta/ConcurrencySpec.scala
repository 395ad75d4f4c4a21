package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Multi-writer OCC (mirrors the reference's concurrent-writes integration
  * tests): parallel appends race on versions; losers retry and everyone
  * lands on a distinct version with no lost rows. */
class ConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  test("parallel appends all commit with distinct versions, no lost rows") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-conc").toString)
    t.write(Seq((-1, "seed")).toDF("id", "s"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = (0 until 6).map { i =>
      Future {
        // fresh handle per writer, like separate processes sharing storage
        val w = DeltaTable.forPath(spark, t.path)
        w.write(Seq((i, s"w$i")).toDF("id", "s"))
      }
    }
    val versions = Await.result(Future.sequence(writers), 120.seconds)
    pool.shutdown()
    assert(versions.distinct.size == 6, s"versions not distinct: $versions")
    assert(t.toDF().count() == 7)
    assert(t.toDF().select("id").as[Int].collect().toSet == (Set(-1) ++ (0 until 6)))
  }

  test("multi-part checkpoint round-robins actions and reconstructs via pointer") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-mp").toString)
    (0 until 5).foreach(i => t.write(Seq((i, s"r$i")).toDF("id", "s")))
    val snap = t.snapshot()
    // Force multi-part: >= 7 actions (metaData + protocol + 5 adds), 2/part.
    Checkpoints.write(spark, t.log, snap, actionsPerPart = 2L)
    val Some((cv, nActions, parts)) = t.log.readLastCheckpoint()
    assert(cv == snap.version && parts.exists(_ >= 3) && nActions >= 7)
    // direct read of the parts reassembles the full state
    val cp = Checkpoints.read(spark, t.log, cv, parts)
    assert(cp.activeFiles.size == 5 && cp.metadata.nonEmpty && cp.protocol.nonEmpty)
    // and the normal snapshot path resolves through the multi-part pointer
    // even with the pre-checkpoint commits gone (state only from checkpoint)
    t.log.listCommitVersions().filter(_ <= cv)
      .foreach(v => t.log.fs.delete(t.log.commitFile(v), false))
    val fresh = DeltaTable.forPath(spark, t.path)
    assert(fresh.toDF().count() == 5)
    assert(fresh.snapshot().version == cv)
  }

  test("log cleanup keeps recent checkpoints, drops commits below retention") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-clean").toString)
    t.checkpointInterval = 2 // checkpoints at v1, v3, v5, ...
    (0 until 10).foreach(i => t.write(Seq((i, "x")).toDF("id", "s")))
    val cpsBefore = Checkpoints.listCheckpointVersions(t.log)
    assert(cpsBefore.size >= 4)
    // discovery/validation wrappers (reference: discoverCheckpoints,
    // findLatestCheckpoint, validateCheckpoint, getCleanableLogVersions)
    assert(t.discoverCheckpoints() == cpsBefore)
    assert(t.findLatestCheckpoint().contains(cpsBefore.last))
    assert(t.validateCheckpoint(cpsBefore.last))
    assert(!t.validateCheckpoint(999L))
    val cleanable = t.getCleanableLogVersions(keepCheckpoints = 2)
    assert(cleanable.nonEmpty && cleanable.forall(_ < cpsBefore.takeRight(2).head))
    val (cpDel, cDel) = t.cleanupLog(keepCheckpoints = 2)
    assert(cDel == cleanable.size)
    assert(cpDel > 0 && cDel > 0)
    val cps = Checkpoints.listCheckpointVersions(t.log)
    assert(cps.size == 2)
    // current state still fully reconstructible
    assert(t.toDF().count() == 10)
    assert(t.snapshot().version == 9)
    // time travel to the oldest retained checkpoint still works
    assert(t.asOf(cps.head).count() == cps.head + 1)
  }

  test("object-store conditional-put path: racing commits yield exactly one winner") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-s3race").toString)
    t.write(Seq((0, "seed")).toDF("id", "s"))
    // Emulated object store: the PUT is conditional on the SERVER
    // (ConcurrentHashMap.putIfAbsent arbitrates); the winner's object is
    // mirrored into the table directory so log readers observe it — the
    // wiring a real s3a/gs deployment gets via DeltaLog.registerCommitStore.
    val api = new InMemoryObjectApi(materialize = (key, body) => {
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(key))
      val out = t.log.fs.create(p, false)
      try out.write(body) finally out.close()
    })
    t.log.commitStoreOverride = Some(new ConditionalPutCommitStore(api))
    try {
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = (0 until 8).map { i =>
        Future {
          gate.await()
          try { t.log.writeCommit(1, Seq(CommitInfo(0L, s"S3-RACER-$i"))); true }
          catch { case _: ConcurrencyException => false }
        }
      }
      gate.countDown()
      val wins = Await.result(Future.sequence(racers), 60.seconds)
      pool.shutdown()
      assert(wins.count(identity) == 1, s"winners: ${wins.count(identity)}")
      assert(api.putAttempts.get() >= 1)
      assert(t.log.readCommit(1).nonEmpty) // the winner's bytes are intact
    } finally t.log.commitStoreOverride = None
  }

  test("typed error taxonomy: stable codes, reference hierarchy") {
    val ce = new ConcurrencyException(3)
    assert(ce.code == "CONCURRENCY_ERROR")
    assert(ce.isInstanceOf[DeltaException])
    val vm = new VersionMismatchException("p", None, Some("1"))
    assert(vm.code == "VERSION_MISMATCH")
    assert(vm.isInstanceOf[StorageException] && vm.operation == "writeConditional")
    val fm = new FileMissingException("x")
    assert(fm.code == "FILE_NOT_FOUND" && fm.operation == "read" && fm.path == "x")
    assert(new ValidationException("bad").code == "VALIDATION_ERROR")
    assert(new CdcException("c").code == "CDC_ERROR")
    // the log's real conflict path raises the typed exception
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-errs").toString)
    t.write(Seq((1, "a")).toDF("id", "s"))
    val err = intercept[ConcurrencyException] {
      t.log.writeCommit(0, Seq(CommitInfo(0L, "DUP")))
    }
    assert(err.code == "CONCURRENCY_ERROR")
    // retryability classification + formatting utils (reference:
    // isRetryableError errors.ts:407, formatBytes/formatDuration vacuum.ts)
    assert(Errors.isRetryable(err))
    assert(!Errors.isRetryable(new ValidationException("v")))
    assert(!Errors.isRetryable(new RuntimeException("x")))
    assert(Errors.formatBytes(0) == "0 Bytes")
    assert(Errors.formatBytes(1536) == "1.5 KB")
    assert(Errors.formatBytes(128L * 1024 * 1024) == "128 MB")
    assert(Errors.formatDuration(250) == "250ms")
    assert(Errors.formatDuration(2500) == "2.5s")
    assert(Errors.formatDuration(150000) == "2.5m")
  }

  test("raw commit race: exactly one of N simultaneous writers of a version wins") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-race").toString)
    t.write(Seq((0, "seed")).toDF("id", "s"))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gate = new java.util.concurrent.CountDownLatch(1)
    // All 8 threads write commit 1 at the same instant — the local-FS
    // hard-link path must admit exactly one (check-then-create would let
    // several "succeed" and overwrite each other).
    val racers = (0 until 8).map { i =>
      Future {
        gate.await()
        try { t.log.writeCommit(1, Seq(CommitInfo(0L, s"RACER-$i"))); true }
        catch { case _: ConcurrencyException => false }
      }
    }
    gate.countDown()
    val wins = Await.result(Future.sequence(racers), 60.seconds)
    pool.shutdown()
    assert(wins.count(identity) == 1, s"winners: ${wins.count(identity)}")
    // The surviving commit is intact NDJSON from the single winner.
    assert(t.log.readCommit(1).nonEmpty)
  }
}
