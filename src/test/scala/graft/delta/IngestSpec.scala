package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Idempotent file-level ingest (the COPY INTO verb): only never-ingested
 * source files load; re-runs are no-ops; a file re-written in place (new
 * size/mtime) re-ingests; each chunk is one atomic commit carrying the
 * loaded-file identities.
 */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeSrc(dir: String, name: String, ids: Range): Unit =
    spark.range(ids.head, ids.last + 1).select(col("id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.stage_$name")
      .ensuring(_ => {
        // move the single part file under a stable name
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val staged = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/.stage_$name"))
          .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
        // rename onto an existing destination silently no-ops on local fs
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$name"), false)
        fs.rename(staged, new org.apache.hadoop.fs.Path(s"$dir/$name"))
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/.stage_$name"), true)
        true
      })

  test("ingest loads fresh files once; re-runs skip; new files load incrementally") {
    val src = tmp("graft-ingest-src")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-t"))
    t.write(Seq(-1L).toDF("id")) // schema exists
    writeSrc(src, "a.parquet", 0 until 10)
    writeSrc(src, "b.parquet", 10 until 30)

    val r1 = Ingest.run(spark, t, src)
    assert(r1.filesIngested == 2 && r1.filesSkipped == 0)
    assert(r1.rowsIngested == 30)
    assert(t.toDF().count() == 31)

    // idempotent re-run: nothing loads
    val r2 = Ingest.run(spark, t, src)
    assert(r2.filesIngested == 0 && r2.filesSkipped == 2)
    assert(t.toDF().count() == 31)

    // a NEW file loads; the old two stay skipped
    writeSrc(src, "c.parquet", 30 until 35)
    val r3 = Ingest.run(spark, t, src)
    assert(r3.filesIngested == 1 && r3.filesSkipped == 2)
    assert(r3.rowsIngested == 5)
    assert(t.toDF().count() == 36)
  }

  test("a file re-written in place (changed size) re-ingests — COPY INTO contract") {
    val src = tmp("graft-ingest-rw")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-rwt"))
    t.write(Seq(-1L).toDF("id"))
    writeSrc(src, "a.parquet", 0 until 5)
    assert(Ingest.run(spark, t, src).filesIngested == 1)
    writeSrc(src, "a.parquet", 0 until 50) // same name, different content
    val r = Ingest.run(spark, t, src)
    assert(r.filesIngested == 1, "changed file identity must re-ingest")
    assert(t.toDF().filter(col("id") >= 0).count() == 55)
  }

  test("chunking: each chunk is one atomic commit carrying its file identities") {
    val src = tmp("graft-ingest-chunk")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-chunkt"))
    t.write(Seq(-1L).toDF("id"))
    (0 until 5).foreach(i => writeSrc(src, s"f$i.parquet", i * 10 until (i + 1) * 10))
    val v0 = t.version
    val r = Ingest.run(spark, t, src, chunkFiles = 2)
    assert(r.filesIngested == 5)
    assert(t.version == v0 + 3, "5 files / chunk 2 = 3 commits")
    val ops = (v0 + 1 to t.version).flatMap(v => t.log.readCommit(v)).collect {
      case c: CommitInfo => c.operation
    }
    assert(ops.forall(_ == Ingest.Operation))
    // skip-list is the union across chunked commits
    assert(Ingest.run(spark, t, src).filesSkipped == 5)
  }

  test("source dir is keyed by normalized URI: '/path' and '/path/' share one skip-list") {
    val src = tmp("graft-ingest-norm")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-normt"))
    t.write(Seq(-1L).toDF("id"))
    writeSrc(src, "a.parquet", 0 until 5)
    assert(Ingest.run(spark, t, src).filesIngested == 1)
    val r = Ingest.run(spark, t, src + "/") // trailing slash — same source
    assert(r.filesIngested == 0 && r.filesSkipped == 1,
      "a trailing slash must not defeat the skip-list")
    assert(t.toDF().filter(col("id") >= 0).count() == 5)
  }

  test("two racing ingests of the same source load every file exactly once") {
    // Regression (round-12): ingest commits are plain appends, which never
    // conflict at the file level — without the tail-replay INGEST conflict
    // both racers would compute an empty skip-list and BOTH load every
    // file. chunkFiles=1 maximizes interleaving: each file is its own
    // commit, so the racers trade wins file by file.
    val src = tmp("graft-ingest-race")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-racet"))
    t.write(Seq(-1L).toDF("id"))
    val nFiles = 6
    (0 until nFiles).foreach(i =>
      writeSrc(src, s"f$i.parquet", i * 10 until i * 10 + 10))

    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    import scala.jdk.CollectionConverters._
    val results = (0 until 2).map { _ =>
      pool.submit { () =>
        gate.await(30, TimeUnit.SECONDS)
        Ingest.run(spark, t, src, chunkFiles = 1)
      }
    }
    gate.countDown()
    val rs = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()

    // exactly-once: the union of loads covers all files, with no double-load
    assert(rs.map(_.filesIngested).sum == nFiles.toLong,
      s"expected $nFiles total loads across both racers, got $rs")
    assert(t.toDF().filter(col("id") >= 0).count() == nFiles * 10L,
      "row count proves no file loaded twice")
    // and the skip-list reflects the union: a re-run is a full no-op
    val again = Ingest.run(spark, t, src)
    assert(again.filesIngested == 0 && again.filesSkipped == nFiles)

    // per-file: each identity appears in exactly one INGEST commit
    val keysPerCommit = (0L to t.version).flatMap(v => t.log.readCommit(v))
      .collect { case c: CommitInfo if c.operation == Ingest.Operation =>
        c.operationParameters.get("ingestFiles").toSeq }
      .flatten
      .flatMap(json => org.json4s.jackson.JsonMethods.parse(json) match {
        case org.json4s.JArray(xs) => xs.collect { case org.json4s.JString(s) => s }
        case _ => Nil
      })
    assert(keysPerCommit.size == keysPerCommit.distinct.size,
      s"a file identity was committed twice: ${keysPerCommit.diff(keysPerCommit.distinct)}")
  }

  test("racer overlapping only a LATER chunk still conflicts (cross-chunk exactly-once)") {
    // Regression (round-13): the conflict predicate used to cover only the
    // CURRENT chunk's keys, and a successful chunk commit advanced the
    // scan floor past its own version. A racer whose listing differed —
    // it loaded ONLY f1 (our chunk #2) between our skip-list build and
    // our chunk-#1 commit — landed below our first commit, overlapped no
    // key of chunk #1, and was then never scanned again: f1 double-loaded.
    // The predicate now covers the union of all REMAINING fresh keys.
    val src = tmp("graft-ingest-xchunk")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-xchunkt"))
    t.write(Seq(-1L).toDF("id"))
    writeSrc(src, "f0.parquet", 0 until 10)
    writeSrc(src, "f1.parquet", 10 until 20)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val f1 = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$src/f1.parquet"))
    val f1Key = s"${f1.getPath.getName}|${f1.getLen}|${f1.getModificationTime}"

    var raced = false
    val r = Ingest.run(spark, t, src, chunkFiles = 1, beforeChunkCommit = { n =>
      if (n == 0 && !raced) {
        raced = true
        // the racer: a loader that listed ONLY f1 and committed it
        t.write(spark.read.parquet(s"$src/f1.parquet"), "append",
          opInfo = Some((Ingest.Operation, Map(
            "source" -> src,
            "ingestFiles" -> s"""["$f1Key"]""",
            "format" -> "parquet"))))
      }
    })
    // our loader must detect the racer's f1 and load ONLY f0
    assert(r.filesIngested == 1, s"expected exactly one fresh load, got $r")
    assert(t.toDF().filter(col("id") >= 0).count() == 20L,
      "each file's rows must appear exactly once (f1 double-loaded?)")
    val again = Ingest.run(spark, t, src)
    assert(again.filesIngested == 0 && again.filesSkipped == 2)
  }

  test("census sidecar: skip-list survives log cleanup; rebuild replays only the tail") {
    val src = tmp("graft-ingest-census")
    val t = DeltaTable.forPath(spark, tmp("graft-ingest-censust"))
    t.write(Seq(-1L).toDF("id"))
    writeSrc(src, "a.parquet", 0 until 10)
    assert(Ingest.run(spark, t, src).filesIngested == 1)
    val ingestV = t.version
    // age the ingest commit below the retention floor: 12 checkpointed
    // commits, then keep only the newest 2 checkpoints
    (1 to 12).foreach { i => t.write(Seq(-100L - i).toDF("id")); t.checkpoint() }
    val (_, commitsDeleted) = t.cleanupLog(keepCheckpoints = 2)
    assert(commitsDeleted > 0, "cleanup must actually drop old commits")
    assert(!t.log.listCommitVersions().contains(ingestV),
      "the INGEST commit itself must be below the cleaned floor")
    // the census remembers what the log forgot: the re-offered file skips
    val again = Ingest.run(spark, t, src)
    assert(again.filesIngested == 0 && again.filesSkipped == 1,
      s"census must survive log cleanup, got $again")
    assert(t.toDF().filter(col("id") >= 0).count() == 10L)
    // and the sidecar is a pure cache: deleting it degrades to the
    // retained log (which no longer holds the commit) → the documented
    // re-ingest hazard reappears, proving the census was load-bearing
    val fs = t.log.fs
    fs.listStatus(t.log.logPath)
      .filter(_.getPath.getName.startsWith("_ingest_census."))
      .foreach(st => fs.delete(st.getPath, false))
    val afterDrop = Ingest.run(spark, t, src)
    assert(afterDrop.filesIngested == 1,
      "without census or retained commits the file re-ingests (cache, not truth)")
  }

  test("graft_ingest TVF drives the same verb through SQL") {
    val spark2 = spark
    import graft.plans.GraftSql
    val cat = GraftSql.ensure(spark2)
    spark2.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ing")
    val tbl = s"$cat.ing.t1"
    spark2.sql(s"CREATE TABLE $tbl (id BIGINT)")
    val src = tmp("graft-ingest-sql")
    writeSrc(src, "a.parquet", 0 until 7)
    val row = spark2.sql(s"SELECT * FROM graft_ingest('ing.t1', '$src')").head()
    assert(row.getLong(0) == 1 && row.getLong(1) == 7)
    assert(spark2.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 7)
    val again = spark2.sql(s"SELECT * FROM graft_ingest('ing.t1', '$src')").head()
    assert(again.getLong(0) == 0 && again.getLong(2) == 1)
  }
}
