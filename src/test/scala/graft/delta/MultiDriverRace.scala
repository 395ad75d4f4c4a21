package graft.delta

import org.apache.spark.sql.SparkSession

/**
 * Child-JVM writer for the cross-process OCC race: a SEPARATE DRIVER
 * PROCESS (its own SparkSession, its own DeltaLog instances, no shared
 * JVM state with the racer) hammering appends at one table path. The only
 * coordination between racing drivers is the storage layer's conditional
 * create — exactly the reference's cross-process concurrency contract
 * (reference: src/storage/types.ts:81-119).
 *
 * Each commit carries a disjoint id block (driverId * 10^7 + commit * 10^3
 * + i), so the parent can prove no lost update by arithmetic on the final
 * table. Prints `RACE OK` with the commit count on success.
 */
object MultiDriverRace {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val id = args(1).toLong
    val n = args(2).toInt
    val rows = args(3).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    var committed = 0
    var failures = 0
    while (committed < n) {
      // fresh table handle per attempt: no snapshot carry-over, the same
      // way independent jobs on a cluster each resolve the log from disk
      val t = DeltaTable.forPath(spark, path)
      val base = id * 10000000L + committed * 1000L
      val df = (0 until rows).map(i => (base + i, s"d$id-c$committed-$i"))
        .toDF("id", "s")
      try {
        t.write(df)
        committed += 1
      } catch {
        case e: Throwable =>
          failures += 1
          if (failures > n * 100) {
            System.err.println(s"driver $id giving up: $e")
            spark.stop()
            sys.exit(2)
          }
          Thread.sleep(5L + scala.util.Random.nextInt(45))
      }
    }
    println(s"RACE OK driver=$id commits=$committed retriesAfterConflict=$failures")
    spark.stop()
  }
}
