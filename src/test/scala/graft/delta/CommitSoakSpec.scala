package graft.delta

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import graft.SparkTestBase

/**
 * Object-store commit-throughput soak: N concurrent writers drive the OCC
 * commit protocol against the in-memory object store with the reference's
 * own measured per-op latencies injected (~10/20/5 ms read/write/list,
 * /root/reference/OPERATIONS.md:195-200). The S3 emulator proves
 * ATOMICITY elsewhere (ConcurrencySpec, S3ObjectApiSpec); this spec
 * MEASURES the protocol: commits/s and the lost-race (= retry)
 * distribution as writer count grows, so the backoff defaults in
 * [[Retry.Policy]] are judged against numbers, not intuition. Results are
 * recorded in BASELINE.md §commit-throughput.
 */
class CommitSoakSpec extends SparkTestBase {
  import spark.implicits._

  test("N-writer commit throughput under 10/20/5 ms storage latency") {
    InMemoryFileSystem.install(spark)
    val perWriter = 8
    val rows = for (w <- Seq(1, 2, 4, 8)) yield {
      val auth = s"commitsoak$w"
      InMemoryFileSystem.clear(auth)
      InMemoryFileSystem.setLatency(auth,
        InMemoryFileSystem.Latency(readMs = 10, writeMs = 20, listMs = 5))
      try {
        val path = s"mem://$auth/table"
        val seed = DeltaTable.forPath(spark, path)
        seed.write(Seq((1L, "seed")).toDF("id", "s"))
        val v0 = seed.version
        InMemoryFileSystem.resetPutCensus(auth)
        val pool = Executors.newFixedThreadPool(w)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        var exhausted = 0 // inner Retry gave up; client-level retry resumed
        val t0 = System.nanoTime()
        val writers = (0 until w).map { wi =>
          Future {
            val h = DeltaTable.forPath(spark, path)
            (0 until perWriter).foreach { k =>
              var done = false
              var attempts = 0
              while (!done) {
                try {
                  h.appendCommit(Seq(AddFile(s"f-$wi-$k.parquet", size = 1L)), "SOAK")
                  done = true
                } catch {
                  // inner Retry exhausted (3 tries) — the client-level
                  // retry loop resumes. Under a loaded shared JVM the
                  // pathological case chains many of these; the cap only
                  // guards against a true livelock.
                  case _: ConcurrencyException if attempts < 50 =>
                    attempts += 1
                    synchronized { exhausted += 1 }
                }
              }
            }
          }
        }
        Await.result(Future.sequence(writers), 600.seconds)
        val sec = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        val (attempts, lost) = InMemoryFileSystem.putCensus(auth)
        val commits = w * perWriter
        // correctness under contention: every commit landed on its own version
        assert(DeltaTable.forPath(spark, path).version == v0 + commits,
          s"expected ${v0 + commits} commits, at version ${DeltaTable.forPath(spark, path).version}")
        assert(attempts - lost >= commits) // each landed commit won exactly one put
        val rate = commits / sec
        info(f"writers=$w commits=$commits wall=$sec%.2f s rate=$rate%.1f /s " +
          f"putAttempts=$attempts lostRaces=$lost retryExhaustions=$exhausted")
        (w, commits, sec, rate, lost, exhausted)
      } finally InMemoryFileSystem.clearLatency(auth)
    }
    // Floor sanity, not a benchmark pin: the suite runs late in a loaded
    // shared JVM (standalone rates are 2–10 commits/s; see BASELINE.md),
    // so the assertion only guards against collapse — a livelock or a
    // backoff bug shows up as orders of magnitude, not fractions.
    assert(rows.forall(_._4 > 0.1), s"throughput collapsed: $rows")
  }
}
