package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): DeltaTable =
    DeltaTable.forPath(spark, Files.createTempDirectory("graft-maint").toString)

  test("compact merges small files per partition, dataChange=false, content kept") {
    val t = tmpTable()
    // 8 commits of tiny files → fragmented table
    (0 until 8).foreach(i => t.write(Seq((i, s"row$i")).toDF("id", "s")))
    val before = t.snapshot().activeFiles.size
    assert(before >= 8)
    val r = Maintenance.compact(t)
    assert(r.filesCompacted >= 8 && r.filesCreated < r.filesCompacted)
    assert(t.snapshot().activeFiles.size < before)
    // content identical
    assert(t.toDF().orderBy("id").select("id").as[Int].collect().toSeq == (0 until 8))
    // compaction actions carry dataChange=false
    val actions = t.log.readCommit(r.version)
    assert(actions.collect { case a: AddFile => a }.forall(!_.dataChange))
    assert(actions.collect { case rm: RemoveFile => rm }.forall(!_.dataChange))
  }

  test("compact with a partition predicate touches only matching partitions") {
    val t = tmpTable()
    // 4 commits per partition value → every partition fragmented
    (0 until 4).foreach { i =>
      t.write(Seq((i, "2026-01-01"), (i + 10, "2026-01-02"))
        .toDF("id", "day"), partitionBy = Seq("day"))
    }
    val before = t.snapshot().activeFiles.groupBy(_.partitionValues)
    assert(before.values.forall(_.size == 4))
    val r = Maintenance.compact(t, Maintenance.CompactionConfig(
      partitionFilter = Some("day = '2026-01-02'")))
    assert(r.partitionsTouched == 1L)
    val after = t.snapshot().activeFiles.groupBy(_.partitionValues)
    assert(after(Map("day" -> "2026-01-01")).size == 4,
      "non-matching partition must keep its files untouched")
    assert(after(Map("day" -> "2026-01-02")).size < 4)
    // typed semantics: a range predicate over the CAST value
    val r2 = Maintenance.compact(t, Maintenance.CompactionConfig(
      partitionFilter = Some("day >= '2026-01-01'")))
    assert(r2.partitionsTouched == 1L) // only 01-01 still has >=2 small files
    // content identical through both scoped rewrites
    assert(t.toDF().count() == 8)
  }

  test("compact predicate naming a non-partition column is refused") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "p"), partitionBy = Seq("p"))
    t.write(Seq((3, "a")).toDF("id", "p"))
    val e = intercept[ValidationException] {
      Maintenance.compact(t, Maintenance.CompactionConfig(
        partitionFilter = Some("id > 0")))
    }
    assert(e.getMessage.contains("partition columns"))
    val e2 = intercept[ValidationException] {
      val unpart = tmpTable()
      unpart.write(Seq((1, "a"), (2, "b")).toDF("id", "p"))
      unpart.write(Seq((3, "c")).toDF("id", "p"))
      Maintenance.compact(unpart, Maintenance.CompactionConfig(
        partitionFilter = Some("p = 'a'")))
    }
    assert(e2.getMessage.contains("partitioned"))
    // the internal row-index helper is NOT in predicate scope: a predicate
    // naming __idx must be refused, not silently filter on row position
    val e3 = intercept[ValidationException] {
      Maintenance.compact(t, Maintenance.CompactionConfig(
        partitionFilter = Some("__idx = 0")))
    }
    assert(e3.getMessage.contains("partition columns"))
  }

  test("compact dry run changes nothing") {
    val t = tmpTable()
    (0 until 4).foreach(i => t.write(Seq((i, "x")).toDF("id", "s")))
    val v = t.version
    val r = Maintenance.compact(t, Maintenance.CompactionConfig(dryRun = true))
    assert(r.filesCompacted >= 4 && t.version == v)
  }

  test("dedup exact / by-key / keep-latest") {
    val t = tmpTable()
    t.write(Seq((1, "a", 10), (1, "a", 10), (2, "b", 5), (2, "c", 9)).toDF("id", "s", "ts"))
    val r1 = Maintenance.deduplicate(t, Maintenance.DedupStrategy.Exact)
    assert(r1.rowsBefore == 4 && r1.rowsAfter == 3)
    val r2 = Maintenance.deduplicate(t, Maintenance.DedupStrategy.KeepLatest(Seq("id"), "ts"))
    assert(r2.rowsAfter == 2)
    val got = t.toDF().orderBy("id").as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "a", 10), (2, "c", 9)))
  }

  test("dedup keepFirst / keepLast by explicit order") {
    val t = tmpTable()
    t.write(Seq((1, "x", 3), (1, "y", 7), (2, "p", 1), (2, "q", 2)).toDF("id", "s", "ts"))
    val r = Maintenance.deduplicate(t, Maintenance.DedupStrategy.KeepFirst(Seq("id"), "ts"))
    assert(r.rowsBefore == 4 && r.rowsAfter == 2)
    assert(t.toDF().orderBy("id").as[(Int, String, Int)].collect().toSeq ==
      Seq((1, "x", 3), (2, "p", 1)))
    val t2 = tmpTable()
    t2.write(Seq((1, "x", 3), (1, "y", 7)).toDF("id", "s", "ts"))
    Maintenance.deduplicate(t2, Maintenance.DedupStrategy.KeepLast(Seq("id"), "ts"))
    assert(t2.toDF().as[(Int, String, Int)].collect().toSeq == Seq((1, "y", 7)))
    // no-duplicate input: version unchanged, rewrite discarded
    val t3 = tmpTable()
    t3.write(Seq((1, "x", 3), (2, "y", 7)).toDF("id", "s", "ts"))
    val v0 = t3.version
    val r3 = Maintenance.deduplicate(t3, Maintenance.DedupStrategy.KeepFirst(Seq("id"), "ts"))
    assert(r3.version == v0 && r3.rowsBefore == 2 && r3.rowsAfter == 2)
  }

  test("z-order accepts hilbert alias and reports zone-map stats") {
    val t = tmpTable()
    t.write((1 to 500).map(i => (i % 50, i, s"r$i")).toDF("x", "y", "s"))
    val r = Maintenance.zOrderCluster(t, Seq("x"), targetFiles = 4, curveType = "hilbert")
    assert(r.zoneMaps.isDefined)
    val zm = r.zoneMaps.get
    assert(zm.avgZoneWidth >= zm.minZoneWidth && zm.maxZoneWidth >= zm.avgZoneWidth)
    assert(zm.estimatedSkipRate >= 0.31 && zm.estimatedSkipRate <= 0.9)
    intercept[IllegalArgumentException] {
      Maintenance.zOrderCluster(t, Seq("x"), curveType = "peano")
    }
  }

  test("z-order rewrite preserves content and clusters files by range") {
    val t = tmpTable()
    t.write((1 to 1000).map(i => (i % 97, (i * 31) % 89, s"r$i")).toDF("x", "y", "s"))
    (1 to 3).foreach(_ => t.write((1 to 100).map(i => (i % 7, i % 11, "z")).toDF("x", "y", "s")))
    val total = t.toDF().count()
    val r = Maintenance.zOrderCluster(t, Seq("x", "y"), targetFiles = 4)
    assert(t.toDF().count() == total)
    assert(r.filesAfter <= 4)
    // clustered: per-file x ranges should be narrow for at least one file
    val stats = t.snapshot().activeFiles.flatMap(_.parsedStats)
    assert(stats.nonEmpty)
  }

  test("vacuum removes unreferenced files after retention, protects recent tombstones") {
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.write(Seq((9, "x")).toDF("id", "s"), mode = "overwrite") // v1: v0 file becomes tombstone
    // Dry run with 0 retention (no minimum): v0's file is protected? tombstone
    // is recent → protected only if within retention; with retention 0 nothing
    // is protected and the old file qualifies. Sleep past filesystem
    // mod-time granularity: with cutoff == now, a file stamped in the same
    // clock tick would (correctly) survive and flake this assertion.
    Thread.sleep(1100)
    val dry = Maintenance.vacuum(t, retentionHours = 0, dryRun = true, enforceMinimum = false)
    assert(dry.filesDeleted == 1)
    // metric parity with the reference's VacuumMetrics: the dry run names
    // the doomed file, counts scanned = retained + deleted
    assert(dry.filesToDelete.size == 1 && dry.filesToDelete.head.endsWith(".parquet"))
    assert(dry.filesScanned == dry.filesRetained + dry.filesDeleted)
    val real = Maintenance.vacuum(t, retentionHours = 0, enforceMinimum = false)
    assert(real.filesDeleted == 1)
    assert(real.filesToDelete.isEmpty && real.filesScanned >= 1)
    // current state unaffected; time travel to v0 is now gone
    assert(t.toDF().as[(Int, String)].collect().toSeq == Seq((9, "x")))
    intercept[Exception] { t.asOf(0).collect() }
    // default path enforces the 1 h minimum → nothing recent is deleted
    val t2 = tmpTable()
    t2.write(Seq((1, "a")).toDF("id", "s"))
    t2.write(Seq((2, "b")).toDF("id", "s"), mode = "overwrite")
    assert(Maintenance.vacuum(t2, retentionHours = 0).filesDeleted == 0)
  }

  test("vacuum fans large delete sets out as a Spark job (>64 files)") {
    val t = tmpTable()
    // one write of 80 parts → 80 files, then overwrite them all away
    t.write((1 to 160).toDF("id").repartition(80))
    val nOld = t.snapshot().activeFiles.size
    assert(nOld > 64)
    t.write(Seq(0).toDF("id"), mode = "overwrite")
    Thread.sleep(1100)
    val res = Maintenance.vacuum(t, retentionHours = 0, enforceMinimum = false)
    assert(res.filesDeleted == nOld)
    // everything unreferenced is actually gone from storage
    val left = t.log.fs.listFiles(t.tablePath, true)
    var dataFiles = 0
    while (left.hasNext) {
      val p = left.next().getPath.toString
      if (p.endsWith(".parquet") && !p.contains("_delta_log")) dataFiles += 1
    }
    assert(dataFiles == t.snapshot().activeFiles.size)
    assert(t.toDF().as[Int].collect().toSeq == Seq(0))
  }

  test("distributed vacuum equals driver vacuum and reclaims the same files") {
    val t = tmpTable()
    t.checkpointInterval = 1 // distributed routing needs a checkpoint
    // Hive-partitioned layout (the executor-sharded listing path) + root
    // garbage via an unpartitioned overwrite history
    t.write((1 to 40).map(i => (i % 4, i, s"r$i")).toDF("k", "id", "s"),
      partitionBy = Seq("k"))
    t.delete("""{"id":{"$lte":20}}""") // rewrites files → tombstones
    t.write(Seq((9, 99, "x")).toDF("k", "id", "s"), partitionBy = Seq("k"))
    Thread.sleep(1100)

    val driverDry = Maintenance.vacuum(t, 0, dryRun = true, enforceMinimum = false)
    t.distributedSnapshotThreshold = 1
    val distDry = Maintenance.vacuum(t, 0, dryRun = true, enforceMinimum = false)
    assert(distDry.filesToDelete.toSet == driverDry.filesToDelete.toSet)
    assert(distDry.filesScanned == driverDry.filesScanned)
    assert(distDry.filesDeleted == driverDry.filesDeleted)
    assert(distDry.filesRetained == driverDry.filesRetained)

    val before = t.query("{}").orderBy("id")
      .select("k", "id", "s").as[(Int, Int, String)].collect().toSeq
    val real = Maintenance.vacuum(t, 0, enforceMinimum = false)
    assert(real.filesDeleted == driverDry.filesDeleted)
    // contents untouched; a second distributed pass finds nothing
    assert(t.query("{}").orderBy("id")
      .select("k", "id", "s").as[(Int, Int, String)].collect().toSeq == before)
    assert(Maintenance.vacuum(t, 0, enforceMinimum = false).filesDeleted == 0)
  }

  test("distributed vacuum protects tombstones within retention") {
    val t = tmpTable()
    t.checkpointInterval = 1
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.write(Seq((2, "b")).toDF("id", "s"), mode = "overwrite") // v0 tombstoned NOW
    t.distributedSnapshotThreshold = 1
    // 168 h retention: the fresh tombstone is protected, nothing reclaimed
    val res = Maintenance.vacuum(t, dryRun = true)
    assert(res.filesDeleted == 0)
    assert(res.filesScanned == 2 && res.filesRetained == 2)
    // time travel across the protected tombstone still works
    assert(t.query("{}", None, Some(0L)).as[(Int, String)].collect().toSeq ==
      Seq((1, "a")))
  }

  test("maintenance commit preserves a concurrent append (removes only files it read)") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "s"))
    val snap0 = t.snapshot() // planning snapshot: 1 commit's files
    // Concurrent append lands between planning and commit.
    t.write(Seq((99, "zz")).toDF("id", "s"))
    // Rewrite computed FROM snap0 (dedup of the old rows only).
    val deduped = t.toDF(snap0).distinct()
    val adds = t.writeDataFiles(deduped, Nil, snap0.schema)
    Maintenance.commitMaintenance(t, snap0, snap0.activeFiles, adds,
      "DEDUPLICATE", Map.empty, dataChange = true)
    // The appended row must survive; the dup must be gone.
    val got = t.toDF().orderBy("id").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (2, "b"), (99, "zz")))
  }

  test("maintenance commit conflicts when a file it read was rewritten concurrently") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "s"))
    val snap0 = t.snapshot()
    val deduped = t.toDF(snap0).distinct()
    val adds = t.writeDataFiles(deduped, Nil, snap0.schema)
    // A concurrent DELETE rewrites the file snap0's rows came from:
    // committing the stale rewrite would resurrect the deleted row.
    t.delete("""{"id":2}""")
    intercept[MaintenanceConflictException] {
      Maintenance.commitMaintenance(t, snap0, snap0.activeFiles, adds,
        "DEDUPLICATE", Map.empty, dataChange = true)
    }
    // Nothing was committed and the orphaned rewrite output was cleaned up.
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (1, "a")))
    // Public API re-plans and succeeds from the fresh state.
    val r = Maintenance.deduplicate(t, Maintenance.DedupStrategy.Exact)
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq == Seq((1, "a")))
    assert(r.rowsAfter == 1)
  }
}
