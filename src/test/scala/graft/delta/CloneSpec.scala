package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** CLONE — shallow (absolute-path references, zero data moved) and deep
  * (distributed copy, fully independent). */
class CloneSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("graft-clone").toString

  test("shallow clone reads the source's files; DML on the clone is isolated") {
    val src = DeltaTable.forPath(spark, freshDir())
    src.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"))
    val clone = src.cloneTo(freshDir())
    // zero data files in the clone's directory, content identical
    assert(clone.snapshot().activeFiles.forall(_.path.startsWith("file:")))
    assert(clone.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    // CoW delete on the clone rewrites into the CLONE's dir only
    clone.delete("""{"id":2}""")
    assert(clone.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (3, "c")))
    assert(src.toDF().count() == 3) // source untouched
    // appends land in the clone's own directory (relative paths)
    clone.write(Seq((9, "z")).toDF("id", "s"))
    assert(clone.snapshot().activeFiles.exists(!_.path.startsWith("file:")))
    assert(clone.toDF().count() == 3)
  }

  test("vacuum on a shallow clone never reclaims source-owned files") {
    val src = DeltaTable.forPath(spark, freshDir())
    src.write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val clone = src.cloneTo(freshDir())
    clone.write(Seq((3, "c")).toDF("id", "s"), mode = "overwrite")
    Thread.sleep(1100)
    Maintenance.vacuum(clone, retentionHours = 0, enforceMinimum = false)
    // source files still exist and the source still reads
    assert(src.toDF().count() == 2)
  }

  test("deep clone is independent of the source's files") {
    val src = DeltaTable.forPath(spark, freshDir())
    src.write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val clone = src.cloneTo(freshDir(), deep = true)
    assert(clone.snapshot().activeFiles.forall(!_.path.startsWith("file:")))
    // destroy the source's data files entirely
    src.log.fs.delete(src.tablePath, true)
    assert(clone.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("shallow clone of a partitioned table is rejected; deep clone works") {
    val src = DeltaTable.forPath(spark, freshDir())
    src.write(Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "s", "p"),
      partitionBy = Seq("p"))
    intercept[ValidationException](src.cloneTo(freshDir()))
    val deep = src.cloneTo(freshDir(), deep = true)
    assert(deep.toDF().orderBy("id").select("id", "s", "p")
      .as[(Int, String, String)].collect().toSeq ==
      Seq((1, "a", "x"), (2, "b", "y")))
  }

  test("clones of tables with file-based ('u') deletion vectors stay readable") {
    import org.json4s.JsonAST.{JInt, JObject, JString}
    val dir = freshDir()
    val t = DeltaTable.forPath(spark, dir)
    t.write((0 until 10).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1))
    // a foreign engine re-adds the file with an on-disk DV masking rows 0,1
    val f = t.snapshot().activeFiles.head
    val bytes = DeletionVectors.serialize(DeletionVectors.fromIndexes(Seq(0L, 1L)))
    Files.write(java.nio.file.Paths.get(dir, "dv1.bin"), bytes)
    val dv = JObject(List(
      "storageType" -> JString("u"), "pathOrInlineDv" -> JString("dv1.bin"),
      "offset" -> JInt(0), "sizeInBytes" -> JInt(bytes.length),
      "cardinality" -> JInt(2)))
    val now = System.currentTimeMillis()
    t.log.writeCommit(1, Seq[Action](
      RemoveFile(f.path, now), f.copy(deletionVector = Some(dv)),
      CommitInfo(now, "FOREIGN-DV", Map.empty)))
    assert(t.toDF().count() == 8)
    // shallow: the 'u' descriptor is rebased to an absolute 'p' path so the
    // clone's reader doesn't look for dv1.bin under the CLONE's root
    val shallow = t.cloneTo(freshDir())
    assert(shallow.toDF().count() == 8)
    assert(shallow.snapshot().activeFiles.flatMap(_.deletionVector).forall(
      _.obj.contains("storageType" -> JString("p"))))
    // deep: the DV file is copied alongside the data files — the clone
    // survives the source being deleted outright
    val deep = t.cloneTo(freshDir(), deep = true)
    assert(deep.toDF().count() == 8)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    assert(deep.toDF().count() == 8)
    assert(deep.toDF().select("id").as[Int].collect().sorted.toSeq == (2 until 10))
  }

  test("clone rejects a non-empty target and an unwritten source") {
    val src = DeltaTable.forPath(spark, freshDir())
    intercept[ValidationException](src.cloneTo(freshDir())) // nothing to clone
    src.write(Seq((1, "a")).toDF("id", "s"))
    val occupied = DeltaTable.forPath(spark, freshDir())
    occupied.write(Seq((5, "x")).toDF("id", "s"))
    intercept[ValidationException](src.cloneTo(occupied.path))
  }
}
