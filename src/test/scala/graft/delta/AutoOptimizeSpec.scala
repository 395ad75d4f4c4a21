package graft.delta

import graft.SparkTestBase
import java.nio.file.Files

/** Auto-optimize table properties (Delta's `delta.autoOptimize.*` pair —
  * north-star; the reference compacts only on demand). */
class AutoOptimizeSpec extends SparkTestBase {
  import spark.implicits._

  test("optimizeWrite shuffles rows to their partition: one file per partition dir") {
    val t = DeltaTable.forPath(spark,
      Files.createTempDirectory("graft-ow").toString)
    val df0 = (1 to 40).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "par")
    t.write(df0.repartition(8), partitionBy = Seq("par"))
    // 8 input shards × 2 partition values → up to 16 shard files without it
    assert(t.snapshot().activeFiles.size > 2)
    t.updateConfiguration(Map("delta.autoOptimize.optimizeWrite" -> "true"))
    val before = t.snapshot().activeFiles.size
    t.write(df0.repartition(8), mode = "overwrite")
    val files = t.snapshot().activeFiles
    // repartition(par) routes each partition value to one task → one file each
    assert(files.size == 2, s"expected 2 files, got ${files.size} (was $before)")
    assert(files.map(_.partitionValues("par")).toSet == Set("even", "odd"))
    assert(t.toDF().count() == 40)
  }

  test("autoCompact folds small-file buildup into a layout-only commit") {
    val t = DeltaTable.forPath(spark,
      Files.createTempDirectory("graft-ac").toString)
    t.write(Seq((0, "seed")).toDF("id", "s"))
    t.updateConfiguration(Map(
      "delta.autoOptimize.autoCompact" -> "true",
      "delta.autoOptimize.autoCompact.minNumFiles" -> "5"))
    (1 to 6).foreach(i => t.write(Seq((i, s"r$i")).toDF("id", "s")))
    val files = t.snapshot().activeFiles
    assert(files.size < 6, s"autoCompact should have merged, got ${files.size}")
    assert(t.toDF().count() == 7) // nothing lost
    // the compaction commit is layout-only: history shows a COMPACT op
    val ops = t.describeHistory().map(_._3)
    assert(ops.exists(_.toUpperCase.contains("COMPACT")))
  }
}
