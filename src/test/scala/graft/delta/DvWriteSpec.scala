package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Merge-on-read delete: deletion-vector WRITE path. */
class DvWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): DeltaTable =
    DeltaTable.forPath(spark, Files.createTempDirectory("graft-dvw").toString)

  test("deleteWithDV masks rows without rewriting any data file") {
    val t = tmpTable()
    t.write((0 until 100).map(i => (i, s"r$i")).toDF("id", "s"))
    val filesBefore = t.snapshot().activeFiles.map(_.path).toSet
    val res = t.deleteWithDV("""{"id":{"$lt":10}}""")
    assert(res.rowsAffected == 10 && res.filesRewritten == 0)
    assert(t.snapshot().activeFiles.map(_.path).toSet == filesBefore)
    assert(t.snapshot().activeFiles.exists(_.deletionVector.isDefined))
    assert(t.toDF().count() == 90)
    assert(t.toDF().filter($"id" < 10).isEmpty)
    // time travel: pre-DV version still sees every row
    assert(t.asOf(0).count() == 100)
  }

  test("a second DV delete merges into the existing bitmap") {
    val t = tmpTable()
    t.write((0 until 50).map(i => (i, i % 5)).toDF("id", "k"))
    t.deleteWithDV("""{"k":0}""")
    t.deleteWithDV("""{"k":1}""")
    assert(t.toDF().count() == 30)
    assert(t.toDF().filter($"k" < 2).isEmpty)
    // re-deleting already-masked rows finds nothing (masks apply to scans)
    intercept[IllegalArgumentException](t.deleteWithDV("""{"k":0}"""))
  }

  test("CoW operations after a DV delete resolve the mask") {
    val t = tmpTable()
    t.write((0 until 40).map(i => (i, s"r$i")).toDF("id", "s"))
    t.deleteWithDV("""{"id":{"$lt":5}}""")
    // compaction reads through the mask and rewrites clean files
    Maintenance.compact(t, Maintenance.CompactionConfig(minFilesToCompact = 1))
    assert(t.snapshot().activeFiles.forall(_.deletionVector.isEmpty))
    assert(t.toDF().count() == 35)
    // CoW delete over a DV'd table (fresh table) sees only live rows
    val t2 = tmpTable()
    t2.write((0 until 20).map(i => (i, i % 2)).toDF("id", "k"))
    t2.deleteWithDV("""{"id":{"$lt":4}}""")
    t2.delete("""{"k":1}""")
    assert(t2.toDF().select("id").as[Int].collect().sorted.toSeq ==
      (4 until 20).filter(_ % 2 == 0))
  }

  test("updateWithDV masks matched rows and appends patched images") {
    val t = tmpTable()
    t.write((0 until 50).map(i => (i, i % 5, "orig")).toDF("id", "k", "s"))
    val filesBefore = t.snapshot().activeFiles.map(_.path).toSet
    val res = t.updateWithDV("""{"k":0}""", """{"s":"patched"}""")
    assert(res.rowsAffected == 10 && res.filesRewritten == 0)
    // original files all still active (now DV-masked), plus new patch files
    assert(filesBefore.subsetOf(t.snapshot().activeFiles.map(_.path).toSet))
    assert(t.toDF().count() == 50)
    assert(t.toDF().filter($"s" === "patched").count() == 10)
    assert(t.toDF().filter($"k" === 0 && $"s" === "orig").isEmpty)
    // a second MoR update composes (patch files carry no DV, originals merge)
    t.updateWithDV("""{"k":1}""", """{"s":"patched2"}""")
    assert(t.toDF().count() == 50)
    assert(t.toDF().filter($"s" === "patched2").count() == 10)
  }

  test("mergeWithDV: one commit, matched rows masked, images + inserts appended") {
    val t = tmpTable()
    t.write((0 until 30).map(i => (i, s"v$i")).toDF("id", "s"))
    val filesBefore = t.snapshot().activeFiles.map(_.path).toSet
    val vBefore = t.version
    val src = Seq((5, "patched"), (15, "patched"), (99, "new")).toDF("id", "s")
    val res = t.mergeWithDV(src, Seq("id"))
    assert(res.updated == 2 && res.inserted == 1)
    assert(t.version == vBefore + 1) // ONE commit for mask + images + inserts
    assert(filesBefore.subsetOf(t.snapshot().activeFiles.map(_.path).toSet))
    assert(t.toDF().count() == 31)
    assert(t.toDF().filter($"s" === "patched").select("id").as[Int]
      .collect().sorted.toSeq == Seq(5, 15))
    assert(t.toDF().filter($"id" === 99).count() == 1)
    // Delete action: matched keys vanish without a rewrite
    val res2 = t.mergeWithDV(Seq((99, "x")).toDF("id", "s"), Seq("id"),
      matched = Merge.MergeAction.Delete, insertUnmatched = false)
    assert(res2.deleted == 1)
    assert(t.toDF().filter($"id" === 99).isEmpty)
    // null-key source row applies exactly once (insert only, like CoW merge)
    val withNull = Seq((Some(7), "seven"), (None, "nullkey"))
      .toDF("id", "s")
    val res3 = t.mergeWithDV(withNull, Seq("id"))
    assert(res3.updated == 1 && res3.inserted == 1)
    assert(t.toDF().filter($"id".isNull).count() == 1)
  }

  test("DV build is distributed: driver payload is compressed bitmaps, not row indexes") {
    // 200k matched rows would be 1.6 MB of raw Seq[Long] per the old
    // collect_list path; the executor-side DvBitmapAggregator must hand the
    // driver a run-compressed RoaringBitmapArray orders of magnitude smaller.
    val t = tmpTable()
    t.write((0 until 250000).map(i => (i, i % 5)).toDF("id", "k"))
    val res = t.deleteWithDV("""{"id":{"$lt":200000}}""")
    assert(res.rowsAffected == 200000 && res.filesRewritten == 0)
    assert(t.toDF().count() == 50000)
    // every descriptor that reached the log (and hence the driver) is tiny
    val dvs = t.snapshot().activeFiles.flatMap(_.deletionVector)
    assert(dvs.nonEmpty)
    val totalMasked = dvs.map(dv => DeletionVectors.cardinality(
      DeletionVectors.load(t.log, dv))).sum
    assert(totalMasked == 200000)
    val totalBytes = dvs.map { dv =>
      dv.obj.collectFirst {
        case ("pathOrInlineDv", org.json4s.JString(s)) => s.length.toLong
      }.getOrElse(fail("expected inline payload"))
    }.sum
    assert(totalBytes < 64 * 1024,
      s"driver-side DV payload should be KBs for 200k contiguous deletes, was $totalBytes")
  }

  test("append-only tables reject DV deletes; CDC captures deleted rows") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    t.enableCDC()
    val v = t.deleteWithDV("""{"id":1}""").version
    val ch = t.changes(v, v)
    assert(ch.filter(col(Cdc.ChangeType) === "delete").count() == 1)
    t.updateConfiguration(Map("delta.appendOnly" -> "true"))
    intercept[ValidationException](t.deleteWithDV("""{"id":2}"""))
  }
}
