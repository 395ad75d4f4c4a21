package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, lit}

/**
 * Commit-time safety guards on the OCC tail-replay paths:
 *  - tailState must refuse a hole in its replay window (external log
 *    truncation mid-operation would silently skip actions and let the
 *    conflict check falsely pass);
 *  - the protocol must be re-checked at commit time, not only at read time
 *    (a concurrent protocol upgrade landing in between must not be
 *    committed under);
 *  - WriteConflictException must describe the permanent conflict it is,
 *    not the retryable version race its parent class describes.
 */
class CommitGuardsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): DeltaTable =
    DeltaTable.forPath(spark, Files.createTempDirectory("graft-guards").toString)

  test("tailState refuses a hole in its commit window (external truncation)") {
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s")) // v0
    val snap = t.snapshot()
    t.write(Seq((2, "b")).toDF("id", "s")) // v1
    t.write(Seq((3, "c")).toDF("id", "s")) // v2
    t.log.fs.delete(t.log.commitFile(1), false) // hole at v1
    val e = intercept[IllegalStateException](
      t.tailState(snap, snap.activeFiles.map(_.path).toSet))
    assert(e.getMessage.contains("hole"))
    // intact window still replays fine from the same read snapshot
    val t2 = tmpTable()
    t2.write(Seq((1, "a")).toDF("id", "s"))
    val snap2 = t2.snapshot()
    t2.write(Seq((2, "b")).toDF("id", "s"))
    val (cur, present, _, _) = t2.tailState(snap2, snap2.activeFiles.map(_.path).toSet)
    assert(cur == 1 && present.nonEmpty)
  }

  test("commit-time protocol re-check: upgrade landing after the read fails the write") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val snap = t.snapshot()
    // Racer upgrades the protocol between our read and our commit attempt.
    t.log.writeCommit(t.version + 1, Seq(
      Protocol(minReaderVersion = 1, minWriterVersion = 8),
      CommitInfo(System.currentTimeMillis(), "UPGRADE-PROTOCOL")))
    val abs = new Path(t.tablePath, snap.activeFiles.head.path).toUri.getPath
    intercept[UnsupportedProtocolException](
      t.commitFileRewrite(snap, Set(abs), Nil, "DELETE"))
  }

  test("write() refuses a table whose protocol outruns the writer") {
    // End-to-end guard for the append path (the rewrite paths are pinned
    // above). This exercises the ENTRY check; the in-loop re-check covers
    // the upgrade-in-race-window case and is exercised (with the other
    // commit-loop guards) by the concurrent-writer harness below.
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.log.writeCommit(t.version + 1, Seq(
      Protocol(minReaderVersion = 1, minWriterVersion = 8),
      CommitInfo(System.currentTimeMillis(), "UPGRADE-PROTOCOL")))
    intercept[UnsupportedProtocolException](
      t.write(Seq((2, "b")).toDF("id", "s")))
  }

  test("a lost-race write must not clobber a racer's schema evolution") {
    // Race harness (ConcurrentDmlRaceSpec precedent): one writer evolves
    // the schema while another appends with the OLD schema. Whatever the
    // interleaving — plain writer entering before the evolution commits
    // and committing after, with or without an OCC retry — the final
    // schema must contain BOTH columns: the commit loop re-merges its
    // target schema with the re-resolved snapshot's, so a stale entry
    // snapshot cannot become a lost update on the schema.
    (1 to 4).foreach { round =>
      val t = tmpTable()
      t.write(Seq((1, "a")).toDF("id", "s"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val start = new java.util.concurrent.CyclicBarrier(2)
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[Unit]] = Seq(
        () => { start.await()
          t.write(Seq((2, "b", 9L)).toDF("id", "s", "extra")); () },
        () => { start.await()
          // heavier payload widens this writer's entry→commit window
          t.write(spark.range(0, 20000)
            .select(col("id").cast("int").as("id"), lit("c").as("s"))); () })
      pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
      pool.shutdown()
      val fields = t.snapshot().schema.fieldNames.toSet
      assert(fields == Set("id", "s", "extra"), s"round $round lost a column: $fields")
      assert(t.toDF().count() == 20002)
    }
  }

  test("WriteConflictException message describes a permanent conflict") {
    val e = new WriteConflictException(7)
    assert(e.getMessage.contains("removed or changed by a concurrent commit"))
    assert(e.getMessage.contains("re-run"))
    // stable code preserved for programmatic handling; never blind-retried
    assert(e.code == "CONCURRENCY_ERROR")
    var attempts = 0
    intercept[WriteConflictException](Retry.withRetry() { attempts += 1; throw e })
    assert(attempts == 1, "permanent conflicts must not burn OCC retries")
  }
}
