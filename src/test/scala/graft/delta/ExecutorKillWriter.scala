package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.TaskContext

/**
 * Child-JVM driver for the EXECUTOR-death fault: under
 * `local-cluster[2,2,2048]` (separate executor JVMs), an engine append
 * whose input pipeline `Runtime.halt`s the first executor that touches
 * partition 0 — mid-task, mid-write-job. Spark must absorb the loss
 * (task retry on the surviving/relaunched executor, the parquet commit
 * protocol discarding the dead attempt's partials), and the engine commit
 * must land EXACTLY ONCE with no duplicate or missing rows.
 *
 * Parent sets SPARK_GRAFT_MASTER/SPARK_HOME; prints `EXECKILL OK` with
 * the verification counts on success.
 */
object ExecutorKillWriter {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val markerDir = args(1)
    val spark = graft.SessionEnv.withMaster(SparkSession.builder()
      .appName("graft-exec-kill")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.task.maxFailures", "4")
      .config("spark.ui.enabled", "false"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = spark.range(0L, 1000L, 1L, 4).mapPartitions { it =>
      if (TaskContext.getPartitionId() == 0) {
        // create-if-absent marker: exactly ONE attempt dies, retries run
        val f = new java.io.File(markerDir, "killed-once")
        if (f.createNewFile()) {
          // die like a lost executor: no shutdown hooks, no cleanup
          Runtime.getRuntime.halt(137)
        }
      }
      it
    }.map(i => (i, s"row-$i")).toDF("id", "s")

    val t = DeltaTable.forPath(spark, dir)
    t.write(df)

    val r = DeltaTable.forPath(spark, dir)
    val n = r.toDF().count()
    val distinct = r.toDF().select("id").distinct().count()
    println(s"EXECKILL OK version=${r.version} rows=$n distinct=$distinct")
    spark.stop()
  }
}
