package graft.delta

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/**
 * The in-memory storage backend (reference analog: src/storage/memory.ts:70)
 * run end-to-end: the transaction log, checkpoint parquet, and Spark's own
 * parquet scan/write (committer rename dance included) all live on
 * `mem://` — zero disk I/O. This is the strongest exercise of the
 * FileSystem surface: if rename/listStatus/positioned-read semantics were
 * off, Spark's committer or the parquet footer reader would fail loudly.
 */
class InMemoryFileSystemSpec extends SparkTestBase {
  import spark.implicits._

  InMemoryFileSystem.install(spark)

  private def freshTable(ns: String): DeltaTable = {
    InMemoryFileSystem.clear(ns)
    DeltaTable.forPath(spark, s"mem://$ns/tbl")
  }

  test("full DML lifecycle on mem:// — write, delete, update, merge, time travel") {
    val t = freshTable("lifecycle")
    t.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"))
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))

    t.delete("""{"id":2}""")
    assert(t.toDF().select("id").as[Int].collect().toSet == Set(1, 3))

    t.update("""{"id":1}""", """{"s":"z"}""")
    assert(t.query("""{"id":1}""").select("s").as[String].collect().toSeq == Seq("z"))

    t.merge(Seq((3, "C"), (4, "d")).toDF("id", "s"), Seq("id"))
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "z"), (3, "C"), (4, "d")))

    // time travel replays the log from memory
    assert(t.asOf(0).count() == 3)
  }

  test("OCC on mem:// is arbitrated by atomic putIfAbsent, not check-then-create") {
    val ns = "occ"
    InMemoryFileSystem.clear(ns)
    val path = s"mem://$ns/tbl"
    DeltaTable.forPath(spark, path).write(Seq((0, "seed")).toDF("id", "s"))

    // two writers race the same next version; exactly one wins per version,
    // both land (the loser re-reads and retries at version+1)
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        DeltaTable.forPath(spark, path).write(Seq((i, s"w$i")).toDF("id", "s")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val t = DeltaTable.forPath(spark, path)
    assert(t.toDF().count() == 5)
    assert(t.version == 4L)
  }

  test("partitioned write + pruning + compaction + checkpoint on mem://") {
    val t = freshTable("parts")
    t.write(Seq((1, "x"), (2, "y"), (3, "x")).toDF("id", "p"),
      partitionBy = Seq("p"))
    assert(t.query("""{"p":"x"}""").select("id").as[Int].collect().toSet == Set(1, 3))

    (0 until 12).foreach(i => t.write(Seq((100 + i, "x")).toDF("id", "p")))
    assert(t.toDF().count() == 15)
    // interval-10 checkpoint must have landed as parquet on mem://
    val fs = t.log.fs
    assert(fs.exists(new Path(t.log.logPath, "_last_checkpoint")))
    Maintenance.compact(t)
    assert(t.toDF().count() == 15)
  }

  test("rename and recursive delete honour directory semantics") {
    val fs = new Path("mem://fsops/").getFileSystem(
      spark.sessionState.newHadoopConf())
    InMemoryFileSystem.clear("fsops")
    val out = fs.create(new Path("mem://fsops/a/b/f1"), true)
    out.write("hello".getBytes); out.close()
    assert(fs.getFileStatus(new Path("mem://fsops/a")).isDirectory)

    // dir rename moves the subtree
    assert(fs.rename(new Path("mem://fsops/a"), new Path("mem://fsops/z")))
    assert(fs.exists(new Path("mem://fsops/z/b/f1")))
    assert(!fs.exists(new Path("mem://fsops/a")))

    // non-recursive delete of a non-empty dir refuses; recursive wipes it
    intercept[java.io.IOException] { fs.delete(new Path("mem://fsops/z"), false) }
    assert(fs.delete(new Path("mem://fsops/z"), true))
    assert(!fs.exists(new Path("mem://fsops/z")))

    // create(overwrite=false) refuses an existing object
    val o2 = fs.create(new Path("mem://fsops/k"), false); o2.write(1); o2.close()
    intercept[Exception] {
      val o3 = fs.create(new Path("mem://fsops/k"), false); o3.write(2); o3.close()
    }
  }
}
