package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import scala.util.Random

/**
 * Model-based property check: random interleavings of copy-on-write and
 * merge-on-read DML (write / delete / deleteWithDV / update / updateWithDV
 * / compact / restore) must keep the table equal to a driver-side model of
 * its content after EVERY operation — the two delete paths and the two
 * update paths are interchangeable, maintenance is content-neutral, and
 * restore rewinds to any recorded version. Fixed-seed RNG, replayable.
 */
class DmlModelSpec extends SparkTestBase {
  import spark.implicits._

  test("CoW and MoR DML interleavings match a driver-side model") {
    val rng = new Random(101)
    (1 to 3).foreach { trial =>
      val t = DeltaTable.forPath(spark,
        Files.createTempDirectory(s"graft-model$trial").toString)
      var nextId = 0
      // model: id -> (k, s)
      var model = Map.empty[Int, (Int, String)]
      var history = Map.empty[Long, Map[Int, (Int, String)]]

      def writeBatch(): Unit = {
        val rows = (0 until (2 + rng.nextInt(4))).map { _ =>
          nextId += 1; (nextId, rng.nextInt(4), s"v$nextId")
        }
        t.write(rows.toDF("id", "k", "s"))
        model ++= rows.map(r => r._1 -> ((r._2, r._3)))
      }
      def check(tag: String): Unit = {
        val got = t.toDF().select("id", "k", "s")
          .as[(Int, Int, String)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == model, s"trial $trial after $tag")
        history += (t.version -> model)
      }

      def mergeBatch(mor: Boolean): Unit = {
        // update a random existing id and insert a fresh one
        val existing = model.keys.toSeq.sorted
        val upId = existing(rng.nextInt(existing.size))
        nextId += 1
        val rows = Seq((upId, model(upId)._1, "merged"), (nextId, rng.nextInt(4), s"v$nextId"))
        val src = rows.toDF("id", "k", "s")
        if (mor) t.mergeWithDV(src, Seq("id")) else t.merge(src, Seq("id"))
        model ++= rows.map(r => r._1 -> ((r._2, r._3)))
      }

      writeBatch(); check("seed")
      (1 to 8).foreach { step =>
        rng.nextInt(8) match {
          case 0 => writeBatch(); check(s"$step write")
          case 1 | 2 =>
            val k = rng.nextInt(4)
            if (model.values.exists(_._1 == k)) {
              if (rng.nextBoolean()) t.delete(s"""{"k":$k}""")
              else t.deleteWithDV(s"""{"k":$k}""")
              model = model.filterNot(_._2._1 == k)
              check(s"$step delete k=$k")
            }
          case 3 | 4 =>
            val k = rng.nextInt(4)
            if (model.values.exists(_._1 == k)) {
              if (rng.nextBoolean()) t.update(s"""{"k":$k}""", """{"s":"patched"}""")
              else t.updateWithDV(s"""{"k":$k}""", """{"s":"patched"}""")
              model = model.map { case (id, (kk, s)) =>
                id -> ((kk, if (kk == k) "patched" else s))
              }
              check(s"$step update k=$k")
            }
          case 5 =>
            Maintenance.compact(t,
              Maintenance.CompactionConfig(minFilesToCompact = 1))
            check(s"$step compact")
          case 6 =>
            val versions = history.keys.toSeq.sorted
            val v = versions(rng.nextInt(versions.size))
            t.restore(v)
            model = history(v)
            check(s"$step restore v=$v")
          case 7 =>
            val mor = rng.nextBoolean()
            mergeBatch(mor)
            check(s"$step merge mor=$mor")
        }
      }
    }
  }
}
