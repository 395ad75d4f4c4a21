package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds on
  * SPARK_GRAFT_SF_DIR (driver contract).
  *
  * Robustness (round-3): each query runs once as WARMUP (file listing,
  * codegen JIT, shuffle-file creation) and then three timed times; the
  * reported number is the MEDIAN of the three. One-off JVM/OS noise — the
  * reason rounds 1-2 were uninterpretable driver-to-driver — lands in the
  * discarded samples instead of the headline. The cache is cleared between
  * runs so every sample does identical work. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: one scan per input table (file listing + footer reads + JIT).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      // operators cache intermediates (LSH signatures etc.); drop them so
      // the next sample repeats the full computation
      spark.catalog.clearCache()
      if (ok) sec else -1.0
    }

    // optional args: run only the named queries (iteration aid).
    // Order is PINNED (name-sorted) so runs are comparable across rounds.
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // First run is reported separately: it pays codegen/janino compile,
      // file listing, and JIT — pure per-query overhead at small SF that
      // amortizes to zero at scale. Splitting it from the median makes
      // compile-cost regressions distinguishable from execution ones.
      val first = timeOne(fn)
      val samples = Seq.fill(3)(timeOne(fn))
      val median =
        if (samples.contains(-1.0)) -1.0
        else samples.sorted.apply(1)
      (name, median, first)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val firsts = results.map { case (k, _, f) => "\"" + k + "\":" + f }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Environment attribution: round-5/6 showed byte-identical code varying
    // 1.03-1.28x run-to-run under VM contention. Recording the 1-minute
    // load average and core count IN the result makes a noisy run
    // self-identifying instead of a forensic exercise.
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load = os.getSystemLoadAverage
    val cores = os.getAvailableProcessors
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"first_run":$firsts,"loadavg":$load,"cores":$cores,"sf":"$sfDir"}""")
    spark.stop()
  }
}
