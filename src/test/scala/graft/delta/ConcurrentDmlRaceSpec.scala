package graft.delta

import java.nio.file.Files

import graft.SparkTestBase

/**
 * Randomized two-writer race over the OCC commit paths: two DeltaTable
 * instances on the SAME path (separate snapshot caches — coherence comes
 * only from re-listing the log) run interleaved random DML from two
 * threads. Afterwards:
 *
 *  1. every op that reported success is visible AT THE VERSION it returned
 *     (no lost updates, no torn commits),
 *  2. all committed versions are distinct (the putIfAbsent arbitration),
 *  3. replaying the successful ops serially in commit-version order over an
 *     in-memory model reproduces the final table exactly — i.e. the
 *     concurrent history is equivalent to a serial one (write
 *     serializability), including the tail-replay conflict checks that
 *     replaced full-snapshot checks in commitRewrite/commitDvMask.
 *
 * Threads write disjoint key bands plus one SHARED key that both merge on,
 * so file-level conflicts and commit races both actually occur; ops that
 * exhaust their conflict retries are allowed to fail but must then have NO
 * effect (the model check catches partial application).
 */
class ConcurrentDmlRaceSpec extends SparkTestBase {
  import spark.implicits._

  private val SharedKey = 1000000

  sealed trait Op
  private case class Appended(rows: Seq[(Int, String)]) extends Op
  private case class Deleted(lo: Int, hi: Int) extends Op
  private case class Merged(rows: Seq[(Int, String)]) extends Op

  test("two racing writers serialize: per-version visibility + model equivalence (seeds 51/52)") {
    runRace(51L, 52L)
  }

  test("two racing writers serialize under a different interleaving (seeds 7/8)") {
    runRace(7L, 8L)
  }

  private def runRace(seed1: Long, seed2: Long): Unit = {
    val dir = Files.createTempDirectory("graft-race").toString
    val t0 = DeltaTable.forPath(spark, dir)
    t0.write(Seq((SharedKey, "seed")).toDF("id", "s"))

    val committed = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Op)]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)

    def worker(writerId: Int, seed: Long, steps: Int): Thread = new Thread(() => {
      val rnd = new scala.util.Random(seed)
      val table = DeltaTable.forPath(spark, dir)
      val base = writerId * 10000
      var nextId = 0
      def fresh(n: Int): Seq[(Int, String)] = {
        val rows = (0 until n).map(i => (base + nextId + i, s"w$writerId-${rnd.nextInt(1000)}"))
        nextId += n
        rows
      }
      var live = Vector.empty[(Int, Int)] // appended id bands still possibly present
      (0 until steps).foreach { _ =>
        try {
          rnd.nextInt(7) match {
            case 0 | 1 => // append own fresh rows
              val rows = fresh(1 + rnd.nextInt(3))
              val v = table.write(rows.toDF("id", "s"))
              live = live :+ (rows.head._1, rows.last._1)
              committed.add((v, Appended(rows)))

            case 2 => // CoW delete of an own band (may match nothing → skip)
              if (live.nonEmpty) {
                val (lo, hi) = live(rnd.nextInt(live.size))
                try {
                  val r = table.delete(
                    s"""{"$$and":[{"id":{"$$gte":$lo}},{"id":{"$$lte":$hi}}]}""")
                  committed.add((r.version, Deleted(lo, hi)))
                } catch {
                  case e: IllegalArgumentException
                    if e.getMessage.contains("matched no rows") => ()
                }
              }

            case 3 => // DV delete of an own band
              if (live.nonEmpty) {
                val (lo, hi) = live(rnd.nextInt(live.size))
                try {
                  val r = table.deleteWithDV(
                    s"""{"$$and":[{"id":{"$$gte":$lo}},{"id":{"$$lte":$hi}}]}""")
                  committed.add((r.version, Deleted(lo, hi)))
                } catch {
                  case e: IllegalArgumentException
                    if e.getMessage.contains("matched no rows") => ()
                }
              }

            case 4 => // merge upsert: own fresh keys + the contended shared key
              val rows = fresh(rnd.nextInt(2)) :+
                (SharedKey, s"w$writerId-shared-${rnd.nextInt(1000)}")
              val r = table.merge(rows.toDF("id", "s"), Seq("id"))
              if (rows.size > 1) live = live :+ (rows.head._1, rows(rows.size - 2)._1)
              committed.add((r.version, Merged(rows)))

            case 5 => // MoR merge on the same mix
              val rows = fresh(rnd.nextInt(2)) :+
                (SharedKey, s"w$writerId-mor-${rnd.nextInt(1000)}")
              val r = table.mergeWithDV(rows.toDF("id", "s"), Seq("id"))
              if (rows.size > 1) live = live :+ (rows.head._1, rows(rows.size - 2)._1)
              committed.add((r.version, Merged(rows)))
            case 6 => // layout-only maintenance racing the DML: content must
              // not move, conflicts re-plan internally (replanOnConflict)
              if (rnd.nextBoolean()) Maintenance.compact(table)
              else Maintenance.zOrderCluster(table, Seq("id"))
              // no model effect and no visibility record: layout-only
          }
        } catch {
          case _: ConcurrencyException => failures.incrementAndGet()
          case _: MaintenanceConflictException => failures.incrementAndGet()
        }
      }
    })

    val w1 = worker(1, seed = seed1, steps = 12)
    val w2 = worker(2, seed = seed2, steps = 12)
    w1.start(); w2.start(); w1.join(120000); w2.join(120000)

    val ops = committed.toArray(Array.empty[(Long, Op)]).toSeq.sortBy(_._1)

    // 2. distinct versions — the putIfAbsent arbitration held
    assert(ops.map(_._1).distinct.size == ops.size,
      s"two ops committed the same version: ${ops.map(_._1)}")

    // 1. every successful op is visible at its own version
    val reader = DeltaTable.forPath(spark, dir)
    def contentsAt(v: Long): Map[Int, String] =
      reader.asOf(v).select("id", "s").as[(Int, String)].collect().toMap
    ops.foreach {
      case (v, Appended(rows)) =>
        val got = contentsAt(v)
        rows.foreach { case (id, s) =>
          assert(got.get(id).contains(s), s"append@$v lost ($id,$s)") }
      case (v, Deleted(lo, hi)) =>
        val got = contentsAt(v)
        assert(!got.keys.exists(id => id >= lo && id <= hi),
          s"delete@$v left rows in [$lo,$hi]")
      case (v, Merged(rows)) =>
        val got = contentsAt(v)
        rows.foreach { case (id, s) =>
          assert(got.get(id).contains(s), s"merge@$v lost ($id,$s)") }
    }

    // 3. serial model replay in commit order equals the final table
    var model = Map(SharedKey -> "seed")
    ops.foreach {
      case (_, Appended(rows)) => model = model ++ rows
      case (_, Deleted(lo, hi)) =>
        model = model.filterNot { case (id, _) => id >= lo && id <= hi }
      case (_, Merged(rows)) => model = model ++ rows
    }
    val finalState = reader.toDF().select("id", "s").as[(Int, String)].collect().toMap
    assert(finalState == model,
      s"final state != serial replay; conflictFailures=${failures.get}; " +
        s"extra=${(finalState.toSet -- model.toSet).take(5)} " +
        s"missing=${(model.toSet -- finalState.toSet).take(5)}")

    // the race actually raced: both writers committed surviving work
    def writerOf(op: Op): Option[Int] = op match {
      case Appended(r) => Some(r.head._2.stripPrefix("w").take(1).toInt)
      case Merged(r) => Some(r.head._2.stripPrefix("w").take(1).toInt)
      case _ => None
    }
    val writers = ops.flatMap(o => writerOf(o._2)).toSet
    assert(writers.intersect(Set(1, 2)).size == 2,
      s"expected commits from both writers, saw $writers")
  }
}
