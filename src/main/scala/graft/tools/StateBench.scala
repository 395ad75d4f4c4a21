package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * A/B for the stateful-streaming gates' state store (round 15): n20
 * (cross-batch dropDuplicates) and n23 (flatMapGroupsWithState
 * sessionization) are the two gates whose sf1 scaling is bounded by
 * state-store admission, not by the data transforms. This times each
 * under Spark's default HDFSBackedStateStoreProvider vs
 * RocksDBStateStoreProvider (rocksdbjni ships with the Spark 4
 * distribution), median of `n` runs per provider.
 *
 * Usage: `runMain graft.tools.StateBench <sfDir> [runsPerProvider]`
 */
object StateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val gates = Seq("n20_stream_curation", "n23_stream_sessions")
    def time(gate: String): Double = {
      val t0 = System.nanoTime()
      val rows = graft.NorthStarQueries.queries(gate)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows > 0, s"$gate returned no rows")
      sec
    }
    Seq("hdfs" -> None, "rocksdb" -> Some(rocks)).foreach { case (label, p) =>
      p match {
        case Some(cls) => spark.conf.set(providerKey, cls)
        case None => spark.conf.unset(providerKey)
      }
      gates.foreach { g =>
        val ts = (1 to n).map(_ => time(g)).sorted
        println(f"STATEBENCH provider=$label gate=$g " +
          f"median=${ts(n / 2)}%.2fs all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
