package graft.delta

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Model-based property check for the Column-predicate DML cores (the SQL
 * route): random predicates — including shapes the prune translator CAN
 * push (equality, ranges, IN) and shapes it must pass through untranslated
 * (OR, inequality on strings) — drive delete/update through both the CoW
 * and DV paths, and the table must equal a driver-side model after every
 * op. An over-eager prune translation (dropping a file that held matching
 * rows) shows up here as a model divergence.
 */
class ColumnDmlModelSpec extends SparkTestBase {
  import spark.implicits._

  private case class Pred(column: Column, model: ((Int, Int, String)) => Boolean,
                          desc: String)

  private def genPred(rng: Random): Pred = rng.nextInt(6) match {
    case 0 =>
      val k = rng.nextInt(4)
      Pred(col("k") === k, _._2 == k, s"k=$k")
    case 1 =>
      val k = rng.nextInt(4)
      Pred(col("k") > k, _._2 > k, s"k>$k")
    case 2 =>
      val (a, b) = (rng.nextInt(4), rng.nextInt(4))
      Pred(col("k").isin(a, b), r => r._2 == a || r._2 == b, s"k in ($a,$b)")
    case 3 => // OR: untranslatable for pruning — must still be exact
      val (a, b) = (rng.nextInt(4), rng.nextInt(4))
      Pred(col("k") === a || col("k") === b,
        r => r._2 == a || r._2 == b, s"k=$a or k=$b")
    case 4 =>
      val id = 1 + rng.nextInt(20)
      Pred(col("id") <= id, _._1 <= id, s"id<=$id")
    case 5 => // string inequality: conv() has no $ne → prune nothing, exact rows
      val k = rng.nextInt(4)
      Pred(!(col("k") === k), _._2 != k, s"not k=$k")
  }

  test("random Column predicates over CoW/MoR delete+update match the model") {
    val rng = new Random(909)
    (1 to 3).foreach { trial =>
      val t = DeltaTable.forPath(spark,
        Files.createTempDirectory(s"graft-coldml$trial").toString)
      var nextId = 0
      var model = Map.empty[Int, (Int, String)] // id -> (k, s)

      def writeBatch(): Unit = {
        val rows = (0 until (3 + rng.nextInt(4))).map { _ =>
          nextId += 1; (nextId, rng.nextInt(4), s"v$nextId")
        }
        t.write(rows.toDF("id", "k", "s"))
        model ++= rows.map(r => r._1 -> ((r._2, r._3)))
      }
      def check(tag: String): Unit = {
        val got = t.toDF().select("id", "k", "s").as[(Int, Int, String)]
          .collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == model, s"trial $trial after $tag")
      }

      writeBatch(); check("seed")
      (1 to 10).foreach { step =>
        val p = genPred(rng)
        def matches = model.exists { case (id, (k, s)) => p.model((id, k, s)) }
        rng.nextInt(4) match {
          case 0 | 1 if matches => // delete, CoW or MoR
            if (rng.nextBoolean()) t.delete(p.column) else t.deleteWithDV(p.column)
            model = model.filterNot { case (id, (k, s)) => p.model((id, k, s)) }
            check(s"$step delete ${p.desc}")
          case 2 | 3 if matches => // update with EXPRESSION RHS over the old row
            val set = Seq(
              "s" -> concat(col("s"), lit("!")),
              "k" -> (col("k") + 1).cast("int"))
            if (rng.nextBoolean()) t.update(p.column, set)
            else t.updateWithDV(p.column, set)
            model = model.map { case (id, (k, s)) =>
              if (p.model((id, k, s))) id -> ((k + 1, s + "!")) else id -> ((k, s))
            }
            check(s"$step update ${p.desc}")
          case _ =>
            writeBatch(); check(s"$step write")
        }
      }
    }
  }
}
