package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/**
 * Model-based randomized testing of the transaction log: a seeded random
 * sequence of DML operations runs against BOTH a [[DeltaTable]] and a plain
 * in-memory `Map[Int, String]` model, asserting after every step that the
 * table equals the model — and at the end that time travel to EVERY version
 * ever produced replays exactly the model state recorded when that version
 * was committed.
 *
 * This catches the class of bug example-based specs can't: interactions
 * between operations (a merge after a DV delete after a restore after a
 * compaction...) where each op is individually correct but state
 * reconstruction drifts. Ids are kept unique per table (appends draw from a
 * counter) so merge semantics are unambiguous; versions are read back from
 * the table rather than assumed, so layout-only commits (compaction) are
 * naturally covered by the same invariant — content at a dataChange=false
 * version equals the surrounding state.
 */
class DeltaModelPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def contents(df: DataFrame): Map[Int, String] =
    df.select("id", "s").as[(Int, String)].collect().toMap

  private def runSequence(seed: Long, steps: Int, cdf: Boolean = false,
                          distributed: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft-model-$seed").toString
    val table = DeltaTable.forPath(spark, dir)
    if (distributed) {
      // Force every scan through DistributedSnapshot and every checkpoint
      // roll-forward through Checkpoints.writeDistributed (once a previous
      // checkpoint exists), under the SAME model invariants as the driver
      // path — the random-DML × large-table-code-path cross product.
      table.distributedSnapshotThreshold = 1
      table.checkpointInterval = 5
    }
    // Distributed reads route through query(); driver reads through toDF().
    def currentDf(): DataFrame =
      if (distributed) table.query("{}") else table.toDF()
    def asOfDf(v: Long): DataFrame =
      if (distributed) table.query("{}", None, Some(v)) else table.asOf(v)

    var model = Map.empty[Int, String]
    // history(v) = expected contents at version v
    var history = Vector.empty[Map[Int, String]]
    var nextId = 0
    var lastVersion = -1L
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    // (fromV, toV, expected (change_type, id, s) multiset) per row-level DML
    // op — compact is layout-only and restore's feed is file-granular, so
    // neither records an expectation.
    val expectedCdf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Seq[(String, Int, String)])]
    def recordCdf(from: Long, rows: Seq[(String, Int, String)]): Unit =
      if (cdf) expectedCdf += ((from, lastVersion, rows))

    def freshRows(n: Int): Seq[(Int, String)] = {
      val rows = (0 until n).map { i =>
        (nextId + i, s"v${rnd.nextInt(1000)}")
      }
      nextId += n
      rows
    }

    def afterOp(expected: Map[Int, String], desc: String): Unit = {
      model = expected
      val v = table.version
      trace += s"v$v:$desc"
      assert(v > lastVersion, s"seed=$seed: no commit recorded")
      // every version this op produced (DML + possible layout-only rider)
      // exposes the same post-op contents
      history = history ++ Vector.fill((v - lastVersion).toInt)(model)
      lastVersion = v
      assert(contents(currentDf()) == model,
        s"seed=$seed v=$v: table != model after op")
    }

    if (cdf) { // bootstrap rows, then turn the feed on (metadata-only commit)
      val rows = freshRows(3)
      table.write(rows.toDF("id", "s"))
      afterOp(model ++ rows, "bootstrap")
      table.enableCDC()
      history = history :+ model // enable commit: contents unchanged
      lastVersion = table.version
      trace += s"v$lastVersion:enableCDC"
    }

    (0 until steps).foreach { _ =>
      val fromV = lastVersion + 1
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // append fresh rows
          val rows = freshRows(1 + rnd.nextInt(5))
          table.write(rows.toDF("id", "s"))
          afterOp(model ++ rows, s"append(${rows.map(_._1).mkString(",")})")
          recordCdf(fromV, rows.map { case (k, v) => ("insert", k, v) })

        case 3 => // CoW delete of a random id band
          if (model.nonEmpty) {
            val pivot = model.keys.toSeq(rnd.nextInt(model.size))
            val gone = model.filter(_._1 <= pivot)
            table.delete(s"""{"id":{"$$lte":$pivot}}""")
            afterOp(model.filter(_._1 > pivot), s"delete(<=$pivot)")
            recordCdf(fromV, gone.toSeq.map { case (k, v) => ("delete", k, v) })
          }

        case 4 => // CoW update of a random id band
          if (model.nonEmpty) {
            val pivot = model.keys.toSeq(rnd.nextInt(model.size))
            val tag = s"u${rnd.nextInt(1000)}"
            val touched = model.filter(_._1 >= pivot)
            table.update(s"""{"id":{"$$gte":$pivot}}""", s"""{"s":"$tag"}""")
            afterOp(model.map { case (k, v) =>
              if (k >= pivot) (k, tag) else (k, v) }, s"update(>=$pivot,$tag)")
            recordCdf(fromV,
              touched.toSeq.map { case (k, v) => ("update_preimage", k, v) } ++
              touched.keys.toSeq.map(k => ("update_postimage", k, tag)))
          }

        case 5 | 6 => // merge: upsert a mix of existing and fresh keys
          val existing = rnd.shuffle(model.keys.toSeq)
            .take(rnd.nextInt(3)).map(k => (k, s"m${rnd.nextInt(1000)}"))
          val inserted = freshRows(rnd.nextInt(3))
          val batch = existing ++ inserted
          if (batch.nonEmpty) {
            if (rnd.nextBoolean()) table.merge(batch.toDF("id", "s"), Seq("id"))
            else table.mergeWithDV(batch.toDF("id", "s"), Seq("id"))
            val pre = existing.map { case (k, _) => ("update_preimage", k, model(k)) }
            val post = existing.map { case (k, v) => ("update_postimage", k, v) }
            afterOp(model ++ batch, s"merge(${batch.map(_._1).mkString(",")})")
            recordCdf(fromV, pre ++ post ++
              inserted.map { case (k, v) => ("insert", k, v) })
          }

        case 7 => // DV delete (merge-on-read path); $gte so the pivot row
          // itself always matches (both delete paths throw on zero matches)
          if (model.nonEmpty) {
            val pivot = model.keys.toSeq(rnd.nextInt(model.size))
            val gone = model.filter(_._1 >= pivot)
            table.deleteWithDV(s"""{"id":{"$$gte":$pivot}}""")
            afterOp(model.filter(_._1 < pivot), s"dvDelete(>=$pivot)")
            recordCdf(fromV, gone.toSeq.map { case (k, v) => ("delete", k, v) })
          }

        case 8 => // layout-only rewrite: contents must not move
          if (lastVersion >= 1) {
            if (rnd.nextBoolean()) Maintenance.compact(table)
            else Maintenance.zOrderCluster(table, Seq("id"))
            if (table.version > lastVersion) afterOp(model, "layout-rewrite")
          }

        case 9 => // restore to a random earlier version
          if (lastVersion >= 1) {
            val target = rnd.nextInt(lastVersion.toInt).toLong
            table.restore(target)
            afterOp(history(target.toInt), s"restore($target)")
          }
      }
    }

    // time travel to EVERY version replays the recorded model state,
    // including states overwritten by restore
    history.zipWithIndex.foreach { case (expected, v) =>
      assert(contents(asOfDf(v.toLong)) == expected,
        s"seed=$seed: asOf($v) diverged from model history; " +
          s"ops=${trace.mkString(" | ")}")
    }

    // every row-level DML op's change-feed slice matches the model's
    // expected (change_type, id, s) multiset for exactly that version range
    expectedCdf.foreach { case (from, to, expected) =>
      val got = table.changes(from, to)
        .select(org.apache.spark.sql.functions.col(Cdc.ChangeType),
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("s"))
        .as[(String, Int, String)].collect().toSeq
      assert(got.sorted == expected.sorted,
        s"seed=$seed: changes($from,$to) diverged from model; " +
          s"got=${got.sorted} expected=${expected.sorted}; " +
          s"ops=${trace.mkString(" | ")}")
    }
  }

  test("random DML sequences match an in-memory model (seed 11, 30 steps)") {
    runSequence(seed = 11L, steps = 30)
  }

  test("random DML sequences match an in-memory model (seed 42, 30 steps)") {
    runSequence(seed = 42L, steps = 30)
  }

  test("random DML sequences with checkpoint crossings match the model (seed 7, 45 steps)") {
    // 45 steps guarantees multiple interval-10 checkpoints; the final
    // time-travel sweep then exercises checkpoint-seeded replay for early
    // versions whose commits are behind a checkpoint.
    runSequence(seed = 7L, steps = 45)
  }

  test("random DML on a CDF table: every op's change-feed slice matches the model (seed 101, 30 steps)") {
    runSequence(seed = 101L, steps = 30, cdf = true)
  }

  test("random DML with distributed snapshots and checkpoint roll-forward (seed 23, 25 steps)") {
    // threshold=1 + interval-5 checkpoints: every scan reconstructs state
    // via DistributedSnapshot, every checkpoint past the first rolls
    // forward via Checkpoints.writeDistributed, and the final sweep time
    // travels through distributed-written checkpoints.
    runSequence(seed = 23L, steps = 25, distributed = true)
  }

  test("random DML on a CDF table with distributed paths (seed 77, 20 steps)") {
    runSequence(seed = 77L, steps = 20, cdf = true, distributed = true)
  }
}
