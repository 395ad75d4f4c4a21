package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * CDC insert images must record the rows that were COMMITTED, not a
 * re-execution of the input query: a non-deterministic source (uuid(),
 * rand(), a view that moved between write and capture) would otherwise
 * produce a change feed that disagrees with the table. Both
 * predicate-scoped overwrite paths read back the committed adds.
 */
class CdcDeterminismSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): DeltaTable =
    DeltaTable.forPath(spark, Files.createTempDirectory("graft-cdcdet").toString)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, String, String)] =
    df.select("id", "region", "tag").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  test("replaceWhere CDC inserts equal the committed rows under a non-deterministic source") {
    val t = tmpTable()
    t.write(Seq((1, "keep", "k1"), (2, "swap", "old2"), (3, "swap", "old3"))
      .toDF("id", "region", "tag"))
    t.enableCDC()
    // uuid() yields different values on every execution of the plan —
    // the CDC image is only correct if it reads back what was written
    val src = spark.range(5).select(
      (col("id") + 100).cast("int").as("id"),
      lit("swap").as("region"),
      expr("uuid()").as("tag"))
    val r = t.replaceWhere(src, col("region") === "swap")
    val feed = Cdc.readByVersion(t, r.version, r.version)
    val inserts = rows(feed.filter(col(Cdc.ChangeType) === "insert"))
    val committed = rows(t.toDF().filter(col("region") === "swap"))
    assert(inserts == committed,
      s"CDC insert image diverged from the table:\n$inserts\nvs\n$committed")
    assert(inserts.size == 5)
    // delete image still carries the replaced old rows
    assert(rows(feed.filter(col(Cdc.ChangeType) === "delete")) ==
      Set((2, "swap", "old2"), (3, "swap", "old3")))
  }

  test("dynamic partition overwrite CDC inserts equal the committed rows under uuid()") {
    val t = tmpTable()
    t.write(Seq((1, "a", "x1"), (2, "b", "x2")).toDF("id", "region", "tag"),
      partitionBy = Seq("region"))
    t.enableCDC()
    val src = spark.range(3).select(
      (col("id") + 10).cast("int").as("id"),
      lit("b").as("region"),
      expr("uuid()").as("tag"))
    val v = t.overwritePartitionsDynamic(src)
    val feed = Cdc.readByVersion(t, v, v)
    val inserts = rows(feed.filter(col(Cdc.ChangeType) === "insert"))
    val committed = rows(t.toDF().filter(col("region") === "b"))
    assert(inserts == committed)
    assert(inserts.size == 3)
    assert(rows(feed.filter(col(Cdc.ChangeType) === "delete")) ==
      Set((2, "b", "x2")))
    // untouched partition survives
    assert(rows(t.toDF().filter(col("region") === "a")) == Set((1, "a", "x1")))
  }
}
