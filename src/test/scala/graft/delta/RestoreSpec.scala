package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** RESTORE — log-only file-diff commit back to an earlier version
  * (north-star: Delta Lake RESTORE; the reference has time-travel reads
  * only, src/delta/snapshot.ts). */
class RestoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): DeltaTable =
    DeltaTable.forPath(spark, Files.createTempDirectory("graft-restore").toString)

  test("restore undoes delete + append; history is preserved") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")) // v0
    t.delete("""{"id":2}""")                                   // v1
    t.write(Seq((9, "z")).toDF("id", "s"))                     // v2
    val res = t.restore(0)                                     // v3
    assert(res.version == 3)
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    // history preserved: the pre-restore state is still time-travelable
    assert(t.asOf(2).count() == 3) // 2 survivors + 1 appended
    // and the restore itself can be undone by restoring forward
    t.restore(2)
    assert(t.asOf(4).orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (3, "c"), (9, "z")))
  }

  test("restore is log-only: no data files are rewritten") {
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.write(Seq((2, "b")).toDF("id", "s"))
    val filesBefore = t.snapshot().activeFiles.map(_.path).toSet
    val res = t.restore(0)
    assert(res.filesRewritten == 0)
    // v0's file is re-used verbatim (same path, same bytes)
    assert(t.snapshot().activeFiles.map(_.path).toSet.subsetOf(filesBefore))
  }

  test("restore reinstates the target version's schema") {
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s"))                       // v0
    t.write(Seq((2, "b", 5.0)).toDF("id", "s", "extra"))         // v1 evolves
    assert(t.snapshot().schema.fieldNames.contains("extra"))
    t.restore(0)
    assert(!t.snapshot().schema.fieldNames.contains("extra"))
    assert(t.toDF().columns.toSeq == Seq("id", "s"))
  }

  test("restore to a future version is rejected; vacuumed file fails up front") {
    val t = tmpTable()
    t.write(Seq((1, "a")).toDF("id", "s"))
    intercept[ValidationException](t.restore(5))
    // drop v0's file from storage, then try to restore across it
    t.delete("""{"id":1}""")
    t.write(Seq((2, "b")).toDF("id", "s"))
    val v0File = t.snapshot(Some(0)).activeFiles.head.path
    t.log.fs.delete(new org.apache.hadoop.fs.Path(t.path, v0File), false)
    intercept[FileMissingException](t.restore(0))
  }

  test("restore captures CDC change rows (re-adds as inserts, removals as deletes)") {
    val t = tmpTable()
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "s")) // v0
    t.enableCDC()                                    // v1
    t.delete("""{"id":1}""")                         // v2: the matched file
    // held only id=1, so CoW dropped it without a replacement
    val v3 = t.restore(1).version                    // re-adds that file
    val back = t.changes(v3, v3).groupBy(col(Cdc.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(back == Map("insert" -> 1L))
    assert(t.toDF().count() == 2)
    t.write(Seq((9, "z")).toDF("id", "s"))           // v4
    val v5 = t.restore(1).version                    // drops the appended file
    val fwd = t.changes(v5, v5).groupBy(col(Cdc.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(fwd == Map("delete" -> 1L))
    assert(t.toDF().count() == 2)
  }
}
