package graft

import org.apache.spark.sql.functions._

/** Contract of [[Tables.widen]]: widen ONLY narrow scan-shaped inputs —
  * never already-shuffled plans (where `.rdd` under AQE would eagerly run
  * stages) and never inputs already at-or-above default parallelism. */
class WidenSpec extends SparkTestBase {
  import spark.implicits._

  private def parts(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  private lazy val narrowDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-widen").toString
    (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  test("widens a single-row-group scan to default parallelism") {
    val narrow = spark.read.parquet(narrowDir)
    assert(parts(narrow) == 1, "fixture must read as one split")
    val widened = Tables.widen(narrow)
    assert(parts(widened) == spark.sparkContext.defaultParallelism)
    assert(widened.count() == 100)
  }

  test("no-op when the input already has enough partitions") {
    val wide = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism + 2).toDF()
    // repartition is itself a shuffle op → widen must return it unchanged
    assert(Tables.widen(wide) eq wide)
  }

  test("no-op when a SCAN already yields enough splits (the count branch)") {
    // a multi-file dir read with a tiny split size gives a scan-shaped plan
    // with >= defaultParallelism partitions — the partition-count branch
    // must decline to add a shuffle (the repartition test above never
    // reaches it: the shuffle guard short-circuits first)
    val d = java.nio.file.Files.createTempDirectory("graft-widen-multi").toString
    spark.range(1000).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism + 2)
      .write.mode("overwrite").parquet(d)
    val key = "spark.sql.files.maxPartitionBytes"
    val costKey = "spark.sql.files.openCostInBytes"
    val (old, oldCost) = (spark.conf.get(key), spark.conf.get(costKey))
    spark.conf.set(key, "1024")
    spark.conf.set(costKey, "0")
    try {
      val scan = spark.read.parquet(d)
      assert(parts(scan) >= spark.sparkContext.defaultParallelism,
        "fixture must read as many splits")
      assert(Tables.widen(scan) eq scan)
    } finally { spark.conf.set(key, old); spark.conf.set(costKey, oldCost) }
  }

  test("returns shuffled plans unchanged without touching .rdd") {
    val agg = spark.range(100).toDF("id")
      .groupBy(col("id") % 10).count()
    assert(Tables.widen(agg) eq agg)
    val joined = spark.range(10).toDF("a")
      .join(spark.range(10).toDF("a"), "a")
    assert(Tables.widen(joined) eq joined)
    val windowed = spark.range(10).toDF("a").withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("a"))))
    assert(Tables.widen(windowed) eq windowed)
  }

  test("scan + filter + union shapes do widen") {
    val u = spark.read.parquet(narrowDir)
    val shaped = u.filter(col("id") > 5)
      .unionByName(u.filter(col("id") <= 5))
    val widened = Tables.widen(shaped)
    assert(widened ne shaped)
    assert(parts(widened) == spark.sparkContext.defaultParallelism)
    assert(widened.count() == 100)
  }

  test("groupByKey-family and LIMIT plans are returned unchanged") {
    // MapGroups / FlatMapGroupsWithState / CoGroup / GlobalLimit all
    // require a distribution: reading an RDD off them under AQE would
    // eagerly run their shuffle stages at plan-construction time
    val mg = spark.range(100).as[Long]
      .groupByKey(_ % 10).mapGroups((k, it) => (k, it.size)).toDF()
    assert(Tables.widen(mg) eq mg)
    val cg = spark.range(10).as[Long].groupByKey(identity)
      .cogroup(spark.range(10).as[Long].groupByKey(identity))(
        (k, a, b) => Iterator((k, a.size + b.size))).toDF()
    assert(Tables.widen(cg) eq cg)
    val lim = spark.read.parquet(narrowDir).limit(5)
    assert(Tables.widen(lim) eq lim)
  }

  test("widen itself runs no Spark job (split count from the planned scan)") {
    // the split count must come from the already-planned physical scan
    // (queryExecution.toRdd) — df.rdd would re-plan the subtree, and an
    // eager-execution regression (AQE materializing stages) would surface
    // here as a job
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // build the input OUTSIDE the listener window: read.parquet itself runs
    // a footer-reading job for schema inference, which is not widen's doing
    val input = spark.read.parquet(narrowDir).filter(col("id") > 0)
    input.queryExecution.executedPlan // force analysis+planning pre-window
    spark.sparkContext.addSparkListener(listener)
    try {
      val widened = Tables.widen(input)
      // listener events are async; a job started by widen would enqueue
      // before this drain point in practice — give the bus a beat
      Thread.sleep(300)
      assert(jobs.get() == 0, "widen must not trigger any job")
      assert(parts(widened) == spark.sparkContext.defaultParallelism)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("explicitly coalesced/repartitioned inputs are respected, not widened") {
    // coalesce IS a RepartitionOperation: a caller who pinned partitioning
    // made a choice widen must not override
    val pinned = spark.read.parquet(narrowDir).coalesce(1)
    assert(Tables.widen(pinned) eq pinned)
  }
}
