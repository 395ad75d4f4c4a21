package graft.delta

import org.apache.spark.sql.SparkSession

/**
 * Child-JVM writer for REAL kill -9 crash injection: performs a genuine
 * engine append but parks on [[DeltaTable.onDataFilesStaged]] — data files
 * staged into the table layout, commit not yet attempted — and announces
 * the window on stdout (`DATA_STAGED n=.. paths=..`). The parent spec
 * SIGKILLs the process there, then asserts the table reads clean at the
 * pre-crash version and that vacuum reclaims the orphans. If the kill
 * misses, the process prints `UNREACHABLE_COMMIT` and the spec fails.
 */
object CrashWriter {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-crash-writer")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    DeltaTable.onDataFilesStaged = adds => {
      // the parent greps for this marker, then kill -9s us mid-window
      println(s"DATA_STAGED n=${adds.size} paths=${adds.map(_.path).mkString(",")}")
      Console.out.flush()
      Thread.sleep(600000L)
    }
    val t = DeltaTable.forPath(spark, path)
    t.write((1000L until 1200L).map(i => (i, s"crash-$i")).toDF("id", "s"))
    println("UNREACHABLE_COMMIT")
    spark.stop()
  }
}
