package graft.delta

import graft.SparkTestBase
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, Path, RawLocalFileSystem}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Local filesystem that fails the first N opens / listings with a plain
  * IOException — the shape Hadoop object-store connectors surface transient
  * 5xx as. Registered under the `flaky` scheme via `fs.flaky.impl`. */
class FlakyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (FlakyFileSystem.openFailures.getAndDecrement() > 0)
      throw new java.io.IOException("simulated transient 503")
    super.open(f, bufferSize)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    if (FlakyFileSystem.listFailures.getAndDecrement() > 0)
      throw new java.io.IOException("simulated transient 503")
    super.listStatus(f)
  }
}

object FlakyFileSystem {
  val openFailures = new AtomicInteger(0)
  val listFailures = new AtomicInteger(0)
  def reset(): Unit = { openFailures.set(0); listFailures.set(0) }
}

/** Driver-path read retries (reference wraps storage ops generally,
  * src/delta/retry.ts:79-134): commit/`_last_checkpoint`/CDC driver reads
  * must survive transient storage failures instead of failing the query,
  * while FileNotFound — real state — still fails fast. */
class DriverReadRetrySpec extends SparkTestBase {
  import spark.implicits._

  private def flakyLogFor(dir: String): DeltaLog = {
    val conf = new Configuration(spark.sessionState.newHadoopConf())
    conf.set("fs.flaky.impl", classOf[FlakyFileSystem].getName)
    new DeltaLog(new Path("flaky://" + dir), conf)
  }

  private def fastPolicy = Retry.Policy(baseDelayMs = 1, maxDelayMs = 5)

  test("readCommit survives transient open failures, then succeeds") {
    val dir = Files.createTempDirectory("graft-retry").toString
    val t = DeltaTable.forPath(spark, dir)
    t.write(Seq((1, "a")).toDF("id", "s"))
    FlakyFileSystem.reset()
    FlakyFileSystem.openFailures.set(2)
    val log = flakyLogFor(dir)
    val actions = log.readCommit(0)
    assert(actions.exists(_.isInstanceOf[AddFile]))
    // both injected failures were consumed by retries
    assert(FlakyFileSystem.openFailures.get() <= 0)
  }

  test("listCommitVersions survives transient listing failures") {
    val dir = Files.createTempDirectory("graft-retry2").toString
    val t = DeltaTable.forPath(spark, dir)
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.write(Seq((2, "b")).toDF("id", "s"))
    FlakyFileSystem.reset()
    FlakyFileSystem.listFailures.set(2)
    val log = flakyLogFor(dir)
    assert(log.listCommitVersions() == Seq(0L, 1L))
  }

  test("persistent failure exhausts retries and surfaces the IOException") {
    val dir = Files.createTempDirectory("graft-retry3").toString
    val t = DeltaTable.forPath(spark, dir)
    t.write(Seq((1, "a")).toDF("id", "s"))
    FlakyFileSystem.reset()
    FlakyFileSystem.openFailures.set(100)
    val log = flakyLogFor(dir)
    intercept[java.io.IOException] { log.readCommit(0) }
    // default policy = 3 retries → exactly 4 attempts, not unbounded
    assert(FlakyFileSystem.openFailures.get() == 96)
    FlakyFileSystem.reset()
  }

  test("FileNotFound is not transient: fails fast, no retry") {
    val dir = Files.createTempDirectory("graft-retry4").toString
    val t = DeltaTable.forPath(spark, dir)
    t.write(Seq((1, "a")).toDF("id", "s"))
    FlakyFileSystem.reset()
    val log = flakyLogFor(dir)
    val t0 = System.nanoTime()
    intercept[java.io.FileNotFoundException] { log.readCommit(99) }
    // no backoff sleeps happened (first retry alone would be ≥100 ms)
    assert((System.nanoTime() - t0) / 1e6 < 90)
  }

  test("transient-IO classification: 5xx-ish IOExceptions yes, FileNotFound no") {
    assert(Errors.isTransientIo(new java.io.IOException("503")))
    assert(Errors.isTransientIo(new java.net.SocketTimeoutException("t/o")))
    assert(Errors.isTransientIo(new RuntimeException(
      new java.net.ConnectException("refused"))))
    assert(!Errors.isTransientIo(new java.io.FileNotFoundException("gone")))
    assert(!Errors.isTransientIo(new IllegalStateException("logic bug")))
    // OCC classification unchanged; reads compose on top
    assert(Errors.isRetryable(new ConcurrencyException(3)))
    assert(Errors.isRetryable(new java.io.IOException("503")))
  }

  test("withRetry honors the retryOn predicate with custom policy") {
    var calls = 0
    val got = Retry.withRetry(fastPolicy, retryOn = Errors.isTransientIo) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("blip")
      42
    }
    assert(got == 42 && calls == 3)
    intercept[IllegalStateException] {
      Retry.withRetry(fastPolicy, retryOn = Errors.isTransientIo) {
        throw new IllegalStateException("not transient")
      }
    }
  }
}
