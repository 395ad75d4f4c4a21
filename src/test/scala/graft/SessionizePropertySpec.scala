package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import scala.util.Random

/**
 * Property check for n23's [[NorthStarQueries.sessionize]]: fold random
 * per-user event streams through the group function with
 * [[TestGroupState]] across random time-sliced batch boundaries (plus the
 * final timeout flush), and require the emitted sessions to equal a naive
 * batch gaps-and-islands sessionizer — the same equivalence the oracle
 * gate pins, but across MANY random batch layouts instead of one.
 */
class SessionizePropertySpec extends AnyFunSuite {

  private val GapUs = 30L * 60 * 1000000L

  private type Ev = (Long, java.time.Instant, Long, Double)

  private def instant(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)

  // production's µs clock — the property must check the same normalization
  private def us(i: java.time.Instant): Long = NorthStarQueries.epochUs(i)

  /** Naive reference: sort by (ts, id), break on gap >= 30 min. */
  private def reference(evs: Seq[Ev]): Seq[(Long, Long, Long, Double)] =
    evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (us(e._2), e._3))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)] // start, n, cents
      var start = -1L; var last = -1L; var n = 0L; var cents = 0L
      sorted.foreach { e =>
        val tUs = us(e._2)
        val c = (BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        if (n == 0 || tUs - last >= GapUs) {
          if (n > 0) sessions += ((start, n, cents))
          start = tUs; last = tUs; n = 1; cents = c
        } else { last = tUs; n += 1; cents += c }
      }
      if (n > 0) sessions += ((start, n, cents))
      sessions.map { case (st, nn, cc) => (uid, st, nn, cc / 100.0) }
    }

  /** Simulate the micro-batch loop: time-sliced batches, event-time
    * watermark advanced per batch, expired timers invoked for data-less
    * groups, final watermark push flushing every open session. */
  private def streamed(evs: Seq[Ev], cuts: Seq[Long]): Seq[(Long, Long, Long, Double)] = {
    import NorthStarQueries.{sessionize, OpenSession, SessionOut}
    val batches = (cuts :+ Long.MaxValue).foldLeft(
      (evs.sortBy(e => us(e._2)), Seq.empty[Seq[Ev]])) {
      case ((rest, acc), cut) =>
        val (in, out) = rest.partition(e => us(e._2) <= cut)
        (out, acc :+ in)
    }._2.filter(_.nonEmpty)
    val states = scala.collection.mutable.Map.empty[Long, OpenSession]
    val timers = scala.collection.mutable.Map.empty[Long, Long] // ms
    var watermarkMs = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    def invoke(uid: Long, es: Seq[Ev], timedOut: Boolean): Unit = {
      val st = TestGroupState.create[OpenSession](
        Optional.ofNullable(states.get(uid).orNull),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(watermarkMs), timedOut)
      out ++= sessionize(GapUs)(uid, es.iterator, st)
      if (st.isRemoved) { states.remove(uid); timers.remove(uid) }
      else {
        if (st.exists) states(uid) = st.get
        if (st.getTimeoutTimestampMs.isPresent)
          timers(uid) = st.getTimeoutTimestampMs.get.asInstanceOf[Long]
      }
    }
    batches.foreach { batch =>
      // groups with an expired timer and NO data this batch time out first
      val withData = batch.map(_._1).toSet
      timers.filter { case (uid, t) => !withData(uid) && t <= watermarkMs }
        .keys.toSeq.sorted.foreach(uid => invoke(uid, Seq.empty, timedOut = true))
      batch.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (uid, es) =>
        invoke(uid, es, timedOut = false)
      }
      watermarkMs = batch.map(e => us(e._2) / 1000L).max
    }
    // sentinel: watermark far past everything flushes the remaining state
    watermarkMs = Long.MaxValue / 2
    timers.keys.toSeq.sorted.foreach(uid => invoke(uid, Seq.empty, timedOut = true))
    out.toSeq.map(s => (s.user_id, us(s.session_start), s.n, s.sum_value))
  }

  test("streamed sessions equal batch sessionization across random batch layouts") {
    val rng = new Random(31)
    (1 to 20).foreach { trial =>
      val nUsers = 1 + rng.nextInt(4)
      val evs: Seq[Ev] = (1 to nUsers).flatMap { u =>
        var t = 1700000000000000L + rng.nextInt(1000) * 1000L
        (1 to 3 + rng.nextInt(12)).map { i =>
          // mix of sub-gap and super-gap jumps, µs-grained
          t += (if (rng.nextBoolean()) rng.nextInt(29 * 60) * 1000000L + rng.nextInt(1000000)
                else GapUs + rng.nextInt(60 * 60) * 1000000L)
          (u.toLong, instant(t), i.toLong, rng.nextInt(10000) / 100.0)
        }
      }
      val times = evs.map(e => us(e._2)).sorted
      val nCuts = rng.nextInt(4)
      val cuts = Seq.fill(nCuts)(times(rng.nextInt(times.size))).sorted
      val got = streamed(evs, cuts).sortBy(s => (s._1, s._2))
      val exp = reference(evs).sortBy(s => (s._1, s._2))
      assert(got == exp, s"trial $trial cuts=$cuts:\n got=$got\n exp=$exp")
    }
  }
}
