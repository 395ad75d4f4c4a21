package graft.delta

import graft.SparkTestBase
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.json4s.JsonAST.JString
import org.json4s.jackson.JsonMethods

/**
 * Foreign-table conformance: every fixture here is laid down as RAW BYTES —
 * hand-written commit JSON, parquet data files from Spark's own writer (not
 * this engine's write path), hand-placed checkpoint parquet — the way
 * another Delta implementation would leave a table on disk. Self-round-trip
 * tests (reader reads what this writer wrote) hide complementary bugs; these
 * do not. Scenario matrix follows the reference's DAT-style conformance
 * coverage (reference: tests/conformance/dat-runner.test.ts:1-44): basic
 * replay, time travel, partitioned-with-null, schema change, column
 * mapping, checkpointed log with pruned commits, deletion vectors.
 */
class ConformanceSpec extends SparkTestBase {
  import spark.implicits._

  private def jstr(s: String): String =
    JsonMethods.compact(JsonMethods.render(JString(s)))

  private def writeText(dir: String, rel: String, content: String): Unit = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  /** Write `df` as exactly one parquet file at `dir/rel` via Spark's writer. */
  private def writeParquet(df: org.apache.spark.sql.DataFrame,
                           dir: String, rel: String): Unit = {
    val tmp = Files.createTempDirectory("graft-conf-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(_.matches(".*/part-.*\\.parquet$")).get
    val target = Paths.get(dir, rel)
    Files.createDirectories(target.getParent)
    Files.move(Paths.get(part), target)
  }

  private def protoMeta(schema: StructType,
                        partitionColumns: Seq[String] = Nil,
                        configuration: String = "{}"): Seq[String] = Seq(
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
    s"""{"metaData":{"id":"conf","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schema.json)},""" +
      s""""partitionColumns":${partitionColumns.map(jstr).mkString("[", ",", "]")},""" +
      s""""configuration":$configuration,"createdTime":0}}""")

  private def addJson(path: String, partitionValues: String = "{}"): String =
    s"""{"add":{"path":"$path","partitionValues":$partitionValues,"size":1,""" +
      """"modificationTime":0,"dataChange":true}}"""

  test("foreign log replays adds/removes and time-travels") {
    val dir = Files.createTempDirectory("graft-conf1").toString
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType)))
    writeParquet(Seq((1, "a"), (2, "b")).toDF("id", "s"), dir, "data1.parquet")
    writeParquet(Seq((3, "c")).toDF("id", "s"), dir, "data2.parquet")
    writeParquet(Seq((4, "d")).toDF("id", "s"), dir, "data3.parquet")
    writeText(dir, "_delta_log/00000000000000000000.json",
      (protoMeta(schema) :+ addJson("data1.parquet")).mkString("\n"))
    writeText(dir, "_delta_log/00000000000000000001.json", addJson("data2.parquet"))
    writeText(dir, "_delta_log/00000000000000000002.json",
      Seq("""{"remove":{"path":"data1.parquet","deletionTimestamp":1,"dataChange":true}}""",
        addJson("data3.parquet")).mkString("\n"))

    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 2)
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((3, "c"), (4, "d")))
    assert(t.asOf(0).orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    assert(t.asOf(1).count() == 3)
  }

  test("foreign partitioned table with a null partition value") {
    val dir = Files.createTempDirectory("graft-conf2").toString
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("p", StringType)))
    // Hive layout as an external writer lays it down; the data files carry
    // only the non-partition column.
    writeParquet(Seq(1).toDF("id"), dir, "p=x/a.parquet")
    writeParquet(Seq(2).toDF("id"), dir, "p=__HIVE_DEFAULT_PARTITION__/b.parquet")
    writeText(dir, "_delta_log/00000000000000000000.json",
      (protoMeta(schema, partitionColumns = Seq("p")) :+
        addJson("p=x/a.parquet", """{"p":"x"}""") :+
        addJson("p=__HIVE_DEFAULT_PARTITION__/b.parquet", """{"p":null}""")).mkString("\n"))

    val t = DeltaTable.forPath(spark, dir)
    val rows = t.toDF().orderBy("id").as[(Int, Option[String])].collect().toSeq
    assert(rows == Seq((1, Some("x")), (2, None)))
    // partition filter returns the right slice, null-partition row excluded
    assert(t.query("""{"p":"x"}""").count() == 1)
    assert(t.query("""{"p":null}""").count() == 1)
  }

  test("foreign schema change: later metaData widens, old files null-fill") {
    val dir = Files.createTempDirectory("graft-conf3").toString
    val v0 = StructType(Seq(StructField("id", IntegerType)))
    val v1 = StructType(Seq(StructField("id", IntegerType), StructField("s", StringType)))
    writeParquet(Seq(1).toDF("id"), dir, "old.parquet")
    writeParquet(Seq((2, "b")).toDF("id", "s"), dir, "new.parquet")
    writeText(dir, "_delta_log/00000000000000000000.json",
      (protoMeta(v0) :+ addJson("old.parquet")).mkString("\n"))
    writeText(dir, "_delta_log/00000000000000000001.json",
      (protoMeta(v1).tail :+ addJson("new.parquet")).mkString("\n")) // metaData only

    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF().columns.toSeq == Seq("id", "s"))
    val rows = t.toDF().orderBy("id").as[(Int, Option[String])].collect().toSeq
    assert(rows == Seq((1, None), (2, Some("b"))))
  }

  test("foreign column-mapped table: physical file names, logical reads") {
    val dir = Files.createTempDirectory("graft-conf4").toString
    writeParquet(Seq((1, "a"), (2, "b")).toDF("col-7af1", "col-9c2e"),
      dir, "mapped.parquet")
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col-7af1").build()),
      StructField("s", StringType, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col-9c2e").build())))
    writeText(dir, "_delta_log/00000000000000000000.json",
      (protoMeta(schema,
        configuration = """{"delta.columnMapping.mode":"name"}""") :+
        addJson("mapped.parquet")).mkString("\n"))

    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF().columns.toSeq == Seq("id", "s"))
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    assert(t.query("""{"id":{"$gte":2}}""").count() == 1)
  }

  test("foreign checkpointed log with pruned commits below the checkpoint") {
    val dir = Files.createTempDirectory("graft-conf5").toString
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType)))
    writeParquet(Seq((1, "a")).toDF("id", "s"), dir, "dataA.parquet")
    writeParquet(Seq((2, "b")).toDF("id", "s"), dir, "dataB.parquet")
    writeParquet(Seq((3, "c")).toDF("id", "s"), dir, "dataC.parquet")
    // Checkpoint parquet at v1 in the reference layout (one row per action,
    // JSON-string columns), written by Spark's parquet writer directly.
    val cpSchema = StructType(Seq(
      StructField("add", StringType), StructField("remove", StringType),
      StructField("metaData", StringType), StructField("protocol", StringType)))
    val metaJson =
      s"""{"id":"conf","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(schema.json)},"partitionColumns":[],""" +
        """"configuration":{},"createdTime":0}"""
    val cpRows = Seq(
      Row(null, null, metaJson, null),
      Row(null, null, null, """{"minReaderVersion":1,"minWriterVersion":2}"""),
      Row("""{"path":"dataA.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}""",
        null, null, null),
      Row("""{"path":"dataB.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}""",
        null, null, null))
    val cpDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(cpRows).asJava), cpSchema)
    writeParquet(cpDf, dir, "_delta_log/00000000000000000001.checkpoint.parquet")
    writeText(dir, "_delta_log/_last_checkpoint", """{"version":1,"size":4}""")
    // Commits 0 and 1 were CLEANED UP (log retention); only the tail remains.
    writeText(dir, "_delta_log/00000000000000000002.json", addJson("dataC.parquet"))

    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 2)
    assert(t.toDF().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("foreign add with an inline deletion vector masks rows") {
    val dir = Files.createTempDirectory("graft-conf6").toString
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType)))
    writeParquet((0 until 10).map(i => (i, s"r$i")).toDF("id", "s"),
      dir, "dv.parquet")
    // Inline DV masking row indexes 0 and 3 — the serialized-roaring + Z85
    // codec is independently spec'd against the format (DeletionVectorsSpec);
    // here it stands in for another engine's encoder.
    val raw = DeletionVectors.serialize(DeletionVectors.fromIndexes(Seq(0L, 3L)))
    val padded = if (raw.length % 4 == 0) raw
      else raw ++ Array.fill(4 - raw.length % 4)(0.toByte)
    val payload = DeletionVectors.z85Encode(padded)
    writeText(dir, "_delta_log/00000000000000000000.json",
      (protoMeta(schema) :+
        (s"""{"add":{"path":"dv.parquet","partitionValues":{},"size":1,""" +
          s""""modificationTime":0,"dataChange":true,"deletionVector":""" +
          s"""{"storageType":"i","pathOrInlineDv":${jstr(payload)},"cardinality":2}}}""")
        ).mkString("\n"))

    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF().count() == 8)
    assert(t.toDF().select("id").as[Int].collect().toSet == Set(1, 2, 4, 5, 6, 7, 8, 9))
  }
}
