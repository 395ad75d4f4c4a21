package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.hadoop.fs.Path

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
    // above); write() checks at entry AND re-checks inside the commit
    // loop, so an upgrade landing in the race window is refused too.
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.log.writeCommit(t.version + 1, Seq(
      Protocol(minReaderVersion = 1, minWriterVersion = 8),
      CommitInfo(System.currentTimeMillis(), "UPGRADE-PROTOCOL")))
    intercept[UnsupportedProtocolException](
      t.write(Seq((2, "b")).toDF("id", "s")))
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
