package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random

/**
 * Property check: after ANY sequence of table operations,
 * `restore(v); toDF()` returns exactly the rows `asOf(v)` returns — the
 * restore commit reconstructs historical content, not an approximation of
 * it. Operation sequences are generated from a fixed-seed RNG (same
 * driving style as the other property specs: deterministic, replayable).
 */
class RestorePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def contents(df: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
    df.select(col("id"), col("s")).as[(Int, String)].collect().toSet

  test("restore(v) reproduces asOf(v) across random op sequences") {
    val rng = new Random(42)
    (1 to 5).foreach { trial =>
      val t = DeltaTable.forPath(spark,
        Files.createTempDirectory(s"graft-rp$trial").toString)
      var nextId = 0
      def batch(n: Int) = {
        val rows = (0 until n).map { _ => nextId += 1; (nextId, s"v$nextId") }
        rows.toDF("id", "s")
      }
      t.write(batch(3)) // v0
      val nOps = 3 + rng.nextInt(3)
      (1 to nOps).foreach { _ =>
        rng.nextInt(3) match {
          case 0 => t.write(batch(1 + rng.nextInt(3)))
          case 1 =>
            // delete a random existing id (if the filter matches nothing the
            // engine throws by contract; pick from live rows to avoid that)
            val live = t.toDF().select("id").as[Int].collect()
            if (live.nonEmpty)
              t.delete(s"""{"id":${live(rng.nextInt(live.length))}}""")
          case 2 =>
            val live = t.toDF().select("id").as[Int].collect()
            if (live.nonEmpty)
              t.update(s"""{"id":${live(rng.nextInt(live.length))}}""",
                """{"s":"patched"}""")
        }
      }
      val latest = t.version
      val target = rng.nextInt(latest.toInt + 1).toLong
      val expected = contents(t.asOf(target))
      t.restore(target)
      assert(contents(t.toDF()) == expected,
        s"trial $trial: restore($target) != asOf($target) after $nOps ops")
      // and the pre-restore head is still reachable through history
      assert(t.asOf(latest) != null)
    }
  }
}
