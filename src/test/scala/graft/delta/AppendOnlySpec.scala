package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** `delta.appendOnly=true` enforcement: appends and layout-only rewrites
  * stay legal; anything that removes data rows is rejected. */
class AppendOnlySpec extends SparkTestBase {
  import spark.implicits._

  private def appendOnlyTable(): DeltaTable = {
    val t = DeltaTable.forPath(spark,
      Files.createTempDirectory("graft-ao").toString)
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    t.updateConfiguration(Map("delta.appendOnly" -> "true"))
    t
  }

  test("appends and layout-only compaction remain legal") {
    val t = appendOnlyTable()
    // configuration getter reflects committed metaData (reference:
    // getTableConfiguration, table.ts:369)
    assert(t.configuration.get("delta.appendOnly").contains("true"))
    t.write(Seq((3, "c")).toDF("id", "s"))
    t.write(Seq((4, "d")).toDF("id", "s"))
    Maintenance.compact(t) // dataChange=false rewrite — allowed
    assert(t.toDF().count() == 4)
  }

  test("delete, update, dedup and row-matching merge are rejected") {
    val t = appendOnlyTable()
    intercept[ValidationException](t.delete("""{"id":1}"""))
    intercept[ValidationException](
      t.update("""{"id":1}""", """{"s":"x"}"""))
    t.write(Seq((1, "a")).toDF("id", "s")) // a duplicate
    intercept[ValidationException](
      Maintenance.deduplicate(t, Maintenance.DedupStrategy.Exact))
    intercept[ValidationException](
      t.merge(Seq((1, "patched")).toDF("id", "s"), Seq("id")))
    // insert-only merge (no matched keys) never rewrites a file — allowed
    t.merge(Seq((9, "new")).toDF("id", "s"), Seq("id"))
    assert(t.toDF().filter($"id" === 9).count() == 1)
  }

  test("overwrite is rejected: it removes every file, same class as delete") {
    val t = appendOnlyTable()
    intercept[ValidationException](
      t.write(Seq((9, "z")).toDF("id", "s"), mode = "overwrite"))
    // the staged-but-uncommitted overwrite must not disturb the table
    assert(t.toDF().count() == 2)
    t.write(Seq((3, "c")).toDF("id", "s")) // plain appends still legal
    assert(t.toDF().count() == 3)
  }

  test("restore is rejected only when it would remove files") {
    val t = DeltaTable.forPath(spark,
      Files.createTempDirectory("graft-ao").toString)
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "s")) // v0: two 1-row files
    t.delete("""{"id":1}""") // v1: drops id=1's file, no replacement
    t.updateConfiguration(Map("delta.appendOnly" -> "true")) // v2
    assert(t.snapshot().activeFiles.size == 1)
    t.restore(0) // pure re-add — allowed
    assert(t.toDF().count() == 2)
    // restore reinstated v0's metadata, so the flag is gone (configuration
    // is part of metadata, Delta parity) — re-arm it before the next check
    t.updateConfiguration(Map("delta.appendOnly" -> "true"))
    t.write(Seq((2, "b")).toDF("id", "s"))
    intercept[ValidationException](t.restore(2)) // would drop files
  }
}
