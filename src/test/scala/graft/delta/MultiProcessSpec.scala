package graft.delta

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * CROSS-PROCESS concurrency + crash evidence (round 16): the in-JVM races
 * (ConcurrentDmlRaceSpec) and the local-cluster sweep still share one
 * driver; the reference's concurrency contract is cross-process
 * conditional-create (reference: src/storage/types.ts:81-119). Here two
 * SEPARATE DRIVER JVMs hammer one table path, and a third is kill -9'd in
 * the staged-but-uncommitted window — the storage layer's atomic
 * create-if-absent is the only arbiter.
 */
class MultiProcessSpec extends SparkTestBase {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(main: String, args: Seq[String],
                   env: Map[String, String] = Map.empty): Process = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin, "-Xmx2g", "-cp",
      System.getProperty("java.class.path")) ++ addOpens ++ (main +: args)
    val pb = new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.start()
  }

  private def drain(p: Process): String = {
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    var line = reader.readLine()
    while (line != null) {
      out.append(line).append('\n')
      line = reader.readLine()
    }
    out.toString
  }

  test("two separate driver JVMs race appends: distinct versions, no lost update") {
    val dir = Files.createTempDirectory("graft-2driver").toString
    val t = DeltaTable.forPath(spark, dir)
    t.write(Seq((0L, "seed")).toDF("id", "s")) // v0
    val (nCommits, rows) = (8, 50)

    val a = fork("graft.delta.MultiDriverRace", Seq(dir, "1", s"$nCommits", s"$rows"))
    val b = fork("graft.delta.MultiDriverRace", Seq(dir, "2", s"$nCommits", s"$rows"))
    // drain concurrently: a full stdout pipe would deadlock the children
    val outB = new java.util.concurrent.atomic.AtomicReference[String]("")
    val tb = new Thread(() => outB.set(drain(b)))
    tb.start()
    val outA = drain(a)
    tb.join()
    assert(a.waitFor() == 0, s"driver 1 failed:\n${outA.takeRight(3000)}")
    assert(b.waitFor() == 0, s"driver 2 failed:\n${outB.get.takeRight(3000)}")
    assert(outA.contains("RACE OK") && outB.get.contains("RACE OK"))

    // every commit took a DISTINCT version: contiguous log, no overwrites
    val r = DeltaTable.forPath(spark, dir)
    val versions = r.log.listCommitVersions()
    assert(versions == (0L to (2 * nCommits).toLong),
      s"expected contiguous versions 0..${2 * nCommits}, got $versions")

    // no lost update: every (driver, commit) block landed exactly once
    val df = r.toDF()
    assert(df.count() == 1 + 2L * nCommits * rows)
    assert(df.select(col("id")).distinct().count() == 1 + 2L * nCommits * rows)
    val blocks = df.filter(col("id") >= 10000000L)
      .groupBy((col("id") / 1000L).cast("long").as("block"))
      .count().collect()
    assert(blocks.length == 2 * nCommits)
    assert(blocks.forall(_.getLong(1) == rows),
      s"torn block: ${blocks.filter(_.getLong(1) != rows).mkString(",")}")

    // serial-replay equivalence: a from-scratch log replay (fresh handle,
    // no checkpoint shortcuts — none written) reproduces the same state
    val replayed = Snapshot.replay(
      Snapshot(-1L, None, None, Nil, Nil, Map.empty),
      versions.map(v => v -> r.log.readCommit(v)).iterator)
    assert(replayed.activeFiles.map(_.path).toSet ==
      r.snapshot().activeFiles.map(_.path).toSet)
  }

  test("kill -9 between data-file staging and commit: clean reads, vacuum reclaims") {
    val dir = Files.createTempDirectory("graft-kill9").toString
    val t = DeltaTable.forPath(spark, dir)
    (0 until 3).foreach(k =>
      t.write((k * 100 until (k + 1) * 100).map(i => (i.toLong, s"r$i"))
        .toDF("id", "s")))
    val v0 = t.version
    val n0 = t.toDF().count()

    val p = fork("graft.delta.CrashWriter", Seq(dir))
    // wait for the marker: data files staged, commit NOT yet attempted
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    var marker: String = null
    var line = reader.readLine()
    val header = new StringBuilder
    while (line != null && marker == null) {
      header.append(line).append('\n')
      if (line.startsWith("DATA_STAGED")) marker = line
      else if (line.startsWith("UNREACHABLE_COMMIT"))
        fail(s"kill window missed — writer committed:\n$header")
      else line = reader.readLine()
    }
    assert(marker != null, s"no DATA_STAGED marker:\n$header")
    val staged = marker.split("paths=")(1).split(",").toSeq
    assert(staged.nonEmpty)
    p.destroyForcibly() // SIGKILL in the vulnerable window
    p.waitFor()
    assert(!p.isAlive)

    // (a) the torn state is invisible: same version, same rows
    val r = DeltaTable.forPath(spark, dir)
    assert(r.version == v0, "a killed writer must not advance the log")
    assert(r.toDF().count() == n0)
    // (b) the orphans are REAL on-disk garbage from the killed process
    staged.foreach(path => assert(r.log.fs.exists(new Path(dir, path)),
      s"expected staged orphan $path on disk"))
    // (c) vacuum accounts for and reclaims exactly that garbage
    Thread.sleep(20) // mtimes strictly below the cutoff
    val res = Maintenance.vacuum(r, retentionHours = 0, enforceMinimum = false)
    assert(res.filesDeleted >= staged.size)
    staged.foreach(path => assert(!r.log.fs.exists(new Path(dir, path)),
      s"orphan $path must be reclaimed"))
    val after = DeltaTable.forPath(spark, dir)
    assert(after.toDF().count() == n0, "vacuum must not touch live data")
    assert(after.toDF().agg(sum(col("id"))).head().getLong(0) ==
      (0L until n0).sum)
  }

  test("executor killed mid-task under local-cluster: commit lands exactly once") {
    // local-cluster needs a SPARK_HOME skeleton (jars + work dir) for its
    // raw-java executor launches — same recipe as the round ledger sweeps
    val sparkHome = "/tmp/spark-home"
    new java.io.File(s"$sparkHome/work").mkdirs()
    val jars = java.nio.file.Paths.get(s"$sparkHome/jars")
    if (!java.nio.file.Files.exists(jars))
      java.nio.file.Files.createSymbolicLink(jars,
        java.nio.file.Paths.get("/opt/spark/jars"))

    val dir = Files.createTempDirectory("graft-execkill").toString
    val markerDir = Files.createTempDirectory("graft-execkill-marker").toString
    val p = fork("graft.delta.ExecutorKillWriter", Seq(dir, markerDir), Map(
      "SPARK_GRAFT_MASTER" -> "local-cluster[2,2,2048]",
      "SPARK_GRAFT_EXECUTOR_MEM" -> "1536m",
      "SPARK_HOME" -> sparkHome,
      "SPARK_SCALA_VERSION" -> "2.13"))
    val out = drain(p)
    val code = p.waitFor()
    assert(code == 0, s"exec-kill driver exited $code:\n${out.takeRight(4000)}")
    // the kill really happened (one executor died mid-task)...
    assert(new java.io.File(markerDir, "killed-once").exists(),
      "the fault never fired - test proved nothing")
    // ...and the child verified exactly-once effects from its own driver
    val ok = out.linesIterator.find(_.startsWith("EXECKILL OK"))
    assert(ok.contains("EXECKILL OK version=0 rows=1000 distinct=1000"),
      s"unexpected verification line: $ok\n${out.takeRight(2000)}")
    // independent re-read from the parent session: same table state
    val r = DeltaTable.forPath(spark, dir)
    assert(r.version == 0 && r.toDF().count() == 1000)
  }
}
