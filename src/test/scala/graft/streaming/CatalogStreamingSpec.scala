package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkTestBase
import graft.plans.GraftSql

/**
 * Streaming through the CATALOG: `spark.readStream.table(...)` (DSv2
 * micro-batch stream sharing the V1 source's version-offset semantics)
 * and `df.writeStream.toTable(...)` (task-side parquet writers, one
 * txn-carrying commit per epoch — exactly-once across restarts).
 */
class CatalogStreamingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cat: String = GraftSql.ensure(spark)

  private def sql(q: String) = spark.sql(q)

  private var n = 0
  private def freshTable(): String = synchronized {
    n += 1; s"$cat.strm.t$n"
  }

  private def setup(): Unit = {
    sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.strm")
    ()
  }

  private def drain(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("readStream.table: snapshot batch, then tail across checkpoint restarts") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT, s STRING)")
    sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    sql(s"INSERT INTO $t VALUES (3, 'c')")

    val ckpt = Files.createTempDirectory("graft-rst-ck").toString
    def run(): Set[(Long, String)] = {
      val got = scala.collection.mutable.Set.empty[(Long, String)]
      val q = spark.readStream.table(t)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
          got.synchronized { got ++= b.as[(Long, String)].collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSet
    }
    assert(run() == Set((1L, "a"), (2L, "b"), (3L, "c")))
    sql(s"INSERT INTO $t VALUES (4, 'd')")
    sql(s"INSERT INTO $t VALUES (5, 'e')")
    assert(run() == Set((4L, "d"), (5L, "e")))
  }

  test("readStream.table with startingTimestamp tails from the first commit at or after it") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT, s STRING)")      // v0
    sql(s"INSERT INTO $t VALUES (1, 'a')")             // v1
    sql(s"INSERT INTO $t VALUES (2, 'b')")             // v2
    val dt = graft.delta.DeltaTable.forPath(spark,
      GraftSql.warehousePath(spark).get + "/strm/" + t.split('.').last)
    val v2Ts = dt.commitTimestamp(2)
    Thread.sleep(5)
    sql(s"INSERT INTO $t VALUES (3, 'c')")             // v3

    val out = drain(spark.readStream
      .option("startingTimestamp", v2Ts.toString).table(t), "cat_st")
    assert(out.as[(Long, String)].collect().toSet ==
      Set((2L, "b"), (3L, "c")))
  }

  test("readStream.table on a partitioned table keeps column order (non-trailing partition col)") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    sql(s"INSERT INTO $t VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
    val out = drain(spark.readStream.table(t), "rst_part")
    assert(out.columns.toSeq == Seq("id", "p", "v"))
    assert(out.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "x", 1.5), (2L, "y", 2.5)))
  }

  test("readStream.table applies deletion vectors in the initial snapshot") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t AS SELECT id FROM range(100)")
    spark.conf.set("spark.graft.sql.dml.mor", "true")
    try sql(s"DELETE FROM $t WHERE id % 4 = 1")
    finally spark.conf.unset("spark.graft.sql.dml.mor")
    val out = drain(spark.readStream.table(t), "rst_dv")
    val ids = out.as[Long].collect()
    assert(ids.length == 75)
    assert(!ids.exists(_ % 4 == 1))
  }

  test("readStream.table with maxFilesPerTrigger paces versions into multiple batches") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT)")
    (0 until 4).foreach(i => sql(s"INSERT INTO $t VALUES ($i)"))
    var batches = 0
    val q = spark.readStream.option("maxFilesPerTrigger", "1")
      .option("startingVersion", "1").table(t)
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        if (b.count() > 0) synchronized { batches += 1 }; ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches == 4, s"expected 4 single-file batches, got $batches")
  }

  test("readStream.table refuses data-changing commits (append-only contract)") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t AS SELECT id FROM range(10)")
    val ckpt = Files.createTempDirectory("graft-rst-chg").toString
    // consume the snapshot first, so the DELETE lands in the tail
    val q1 = spark.readStream.table(t).writeStream
      .foreachBatch((_: DataFrame, _: Long) => ())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    sql(s"DELETE FROM $t WHERE id < 5") // CoW rewrite: data-changing commit
    val q2 = spark.readStream.table(t).writeStream
      .foreachBatch((_: DataFrame, _: Long) => ())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[StreamingQueryException] { q2.awaitTermination() }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }

  test("writeStream.toTable appends with exactly-once epochs (Txn in the log)") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id INT, s STRING)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    mem.addData((1, "a"), (2, "b"))
    val ckpt = Files.createTempDirectory("graft-wst-ck").toString
    val q = mem.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).toTable(t)
    q.awaitTermination()
    mem.addData((3, "c"))
    val q2 = mem.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).toTable(t)
    q2.awaitTermination()
    assert(sql(s"SELECT id, s FROM $t ORDER BY id").as[(Int, String)]
      .collect().toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
    // the commit carries the per-epoch transaction (exactly-once marker)
    val path = GraftSql.warehousePath(spark).get + "/strm/" + t.split('.').last
    val dt = graft.delta.DeltaTable.forPath(spark, path)
    assert(dt.snapshot().transactions.nonEmpty, "epoch Txn missing from log")
  }

  test("writeStream.toTable into a partitioned table lands Hive layout + stats") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id INT, p STRING) PARTITIONED BY (p)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    mem.addData((1, "x"), (2, "y"), (3, "x"), (4, null.asInstanceOf[String]))
    val q = mem.toDF().toDF("id", "p").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-wst-p").toString)
      .trigger(Trigger.AvailableNow()).toTable(t)
    q.awaitTermination()
    assert(sql(s"SELECT id FROM $t WHERE p = 'x' ORDER BY id").as[Int]
      .collect().toSeq == Seq(1, 3))
    assert(sql(s"SELECT id FROM $t WHERE p IS NULL").as[Int]
      .collect().toSeq == Seq(4))
    // files sit in Hive partition dirs and carry footer stats
    val path = GraftSql.warehousePath(spark).get + "/strm/" + t.split('.').last
    val dt = graft.delta.DeltaTable.forPath(spark, path)
    val adds = dt.snapshot().activeFiles
    assert(adds.forall(a => a.path.startsWith("p=") ||
      a.path.startsWith("p=__HIVE_DEFAULT_PARTITION__")))
    assert(adds.forall(_.parsedStats.exists(_.numRecords > 0)))
  }

  test("end-to-end: readStream.table -> transform -> writeStream.toTable") {
    setup()
    val src = freshTable()
    val dst = freshTable()
    sql(s"CREATE TABLE $src (id BIGINT, v DOUBLE)")
    sql(s"CREATE TABLE $dst (id BIGINT, v2 DOUBLE)")
    sql(s"INSERT INTO $src SELECT id, CAST(id AS DOUBLE) FROM range(50)")
    val q = spark.readStream.table(src)
      .selectExpr("id", "v * 2 AS v2")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-e2e-ck").toString)
      .trigger(Trigger.AvailableNow()).toTable(dst)
    q.awaitTermination()
    assert(sql(s"SELECT sum(v2) FROM $dst").head().getDouble(0) ==
      (0 until 50).map(_ * 2.0).sum)
  }
}
