package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CdcEnvelopeSpec extends SparkTestBase {
  import spark.implicits._

  test("producer: monotonic seq, op shapes, reset") {
    val p = new CdcProducer(CdcSource(system = "graft", collection = Some("t")),
      nowNanos = () => 42L)
    val c = p.create("a", """{"x":1}""")
    val u = p.update("a", """{"x":1}""", """{"x":2}""")
    val d = p.delete("a", """{"x":2}""")
    assert(Seq(c._seq, u._seq, d._seq) == Seq(0L, 1L, 2L))
    assert(c._op == "c" && c._before.isEmpty && c._after.contains("""{"x":1}"""))
    assert(u._op == "u" && u._before.contains("""{"x":1}""") && u._after.contains("""{"x":2}"""))
    assert(d._op == "d" && d._after.isEmpty)
    assert(c._ts == 42L && c._source.collection.contains("t"))
    val snaps = p.snapshot(Seq("a" -> "{}", "b" -> "{}"))
    assert(snaps.map(_._op).distinct == Seq("r") && snaps.map(_._seq) == Seq(3L, 4L))
    p.resetSequence()
    assert(p.getSequence == 0L)
    intercept[IllegalArgumentException] { p.emit("x", "a", None, None) }
    // DataFrame bridge keeps the envelope columns
    val df = p.toDF(spark, Seq(c, u, d))
    assert(df.columns.toSeq == Seq("_id", "_seq", "_op", "_before", "_after", "_ts", "_source", "_txn"))
    assert(df.count() == 3)
  }

  test("fromOps: dense per-partition seq, consumerFilter slices by op/seq/ts") {
    val rows = Seq((1L, 10L, "a"), (2L, 11L, "b"), (3L, 10L, "c"), (4L, 11L, "d"))
      .toDF("id", "part", "payload")
    val env = CdcEnvelope.fromOps(rows, col("id"),
      when(col("id") % 2 === 0, "u").otherwise(lit("c")),
      lit(null), to_json(struct(col("payload"))),
      orderBy = Seq(col("id")), partitionCol = col("part"),
      tsNanos = col("id") * 1000L)
    val got = env.orderBy("_id").collect()
    // per-partition dense: part 10 → ids 1,3 get seq 0,1; part 11 → ids 2,4 get 0,1
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("1", 0L), ("2", 0L), ("3", 1L), ("4", 1L)))
    assert(CdcEnvelope.consumerFilter(env, operations = Some(Set("u"))).count() == 2)
    assert(CdcEnvelope.consumerFilter(env, fromSeq = Some(1L)).count() == 2)
    assert(CdcEnvelope.consumerFilter(env, fromTimestampNanos = Some(3000L)).count() == 2)
  }

  test("subscription: per-subscriber error isolation, onError, offset resume") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-sub").toString)
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.enableCDC()
    t.write(Seq((2, "b")).toDF("id", "s"))

    val sub = new CdcSubscription(t, "g1")
    var good = 0; var errs = 0
    sub.subscribe(_ => throw new RuntimeException("boom"),
      onError = (_, _) => errs += 1)
    sub.subscribe(df => good += df.count().toInt)
    assert(sub.pollOnce()) // failing handler must not starve the good one
    assert(good == 1 && errs == 1)
    assert(!sub.pollOnce()) // offset advanced past the batch

    t.write(Seq((3, "c")).toDF("id", "s"))
    // a NEW subscription in the same group resumes from the committed offset
    val sub2 = new CdcSubscription(t, "g1")
    var seen: Seq[Int] = Nil
    sub2.subscribe(df => seen = df.select("id").as[Int].collect().toSeq)
    assert(sub2.pollOnce())
    assert(seen == Seq(3)) // only the new commit, not a replay
  }

  test("subscription: batch is redelivered when EVERY handler failed") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-sub-fail").toString)
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.enableCDC()
    t.write(Seq((2, "b")).toDF("id", "s"))

    val sub = new CdcSubscription(t, "gfail")
    var attempts = 0
    var delivered = 0
    sub.subscribe { df =>
      attempts += 1
      if (attempts == 1) throw new RuntimeException("transient")
      delivered += df.count().toInt
    }
    assert(sub.pollOnce()) // every handler failed → offset must NOT advance
    assert(attempts == 1 && delivered == 0)
    assert(sub.pollOnce()) // same batch redelivered (at-least-once)
    assert(attempts == 2 && delivered == 1)
    assert(!sub.pollOnce()) // now committed
  }

  test("corrupt CDC file surfaces as an error, not an empty poll") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-corrupt").toString)
    t.write(Seq((1, "a")).toDF("id", "s"))
    t.enableCDC()
    t.write(Seq((2, "b")).toDF("id", "s"))
    // clobber the change file with bytes that are neither parquet nor JSON
    val dir = Cdc.changeDataDir(t.tablePath)
    val entry = t.log.fs.listStatus(dir).filter(_.getPath.getName.startsWith("cdc-")).head
    val victim =
      if (entry.isDirectory)
        t.log.fs.listStatus(entry.getPath).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).head
      else entry.getPath
    val out = t.log.fs.create(victim, true)
    out.write("not a parquet file".getBytes("UTF-8")); out.close()
    val consumer = t.newConsumer("g2")
    intercept[Exception] { consumer.poll().foreach(_.count()) }
  }
}
