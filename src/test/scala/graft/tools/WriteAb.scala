package graft.tools

import org.apache.spark.sql.SparkSession

import graft.plans.GraftSql

/**
 * Paired A/B: the DIRECT batch write (executors write parquet straight
 * into the table's final layout, one driver metadata commit) versus the
 * V1 STAGING path (stage → read back → rewrite into the table) on the
 * SAME machine state — interleaved samples so host drift hits both arms
 * equally. Reports the per-arm median of the timed samples.
 *
 * Usage: Test/runMain graft.tools.WriteAb [sfDir] [samples]
 */
object WriteAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val samples = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat = GraftSql.ensure(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ab")

    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .createOrReplaceTempView("src")
    val nRows = spark.table("src").count()

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def arm(name: String, direct: Boolean, partitioned: Boolean): Seq[Double] = {
      val t = s"$cat.ab.${name}"
      val part = if (partitioned) " PARTITIONED BY (l_returnflag)" else ""
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (" +
        spark.table("src").schema.fields
          .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ") + s")$part")
      spark.conf.set("spark.graft.write.direct", direct.toString)
      try (0 until samples).map { _ =>
        timed { spark.sql(s"INSERT INTO $t SELECT * FROM src") }
      } finally spark.conf.unset("spark.graft.write.direct")
    }

    // Round-12 shapes: REPLACE WHERE and dynamic partition overwrite —
    // the daily-reload primitives — through each arm. The table is seeded
    // once; each sample replaces the same region/partition.
    def armReplaceWhere(name: String, direct: Boolean): Seq[Double] = {
      val t = s"$cat.ab.$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t AS SELECT * FROM src")
      spark.conf.set("spark.graft.write.direct", direct.toString)
      try (0 until samples).map { _ =>
        timed { spark.sql(s"INSERT INTO $t REPLACE WHERE l_returnflag = 'R' " +
          "SELECT * FROM src WHERE l_returnflag = 'R'") }
      } finally spark.conf.unset("spark.graft.write.direct")
    }
    def armDynamic(name: String, direct: Boolean): Seq[Double] = {
      val t = s"$cat.ab.$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (" +
        spark.table("src").schema.fields
          .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ") +
        ") PARTITIONED BY (l_returnflag)")
      spark.sql(s"INSERT INTO $t SELECT * FROM src")
      spark.conf.set("spark.graft.write.direct", direct.toString)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try (0 until samples).map { _ =>
        timed { spark.sql(s"INSERT OVERWRITE $t " +
          "SELECT * FROM src WHERE l_returnflag = 'R'") }
      } finally {
        spark.conf.unset("spark.graft.write.direct")
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

    // Round-13 shape: identity-table INSERT — the direct arm pre-allocates
    // (two-phase, pinned plan) and writes task-side; the staged arm is the
    // classic stage→rename append with the same allocator.
    def armIdentity(name: String, direct: Boolean): Seq[Double] = {
      val t = s"$cat.ab.$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (rid BIGINT GENERATED ALWAYS AS IDENTITY, " +
        spark.table("src").schema.fields
          .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ") + ")")
      val cols = spark.table("src").schema.fieldNames.mkString(", ")
      spark.conf.set("spark.graft.write.direct", direct.toString)
      try (0 until samples).map { _ =>
        timed { spark.sql(s"INSERT INTO $t ($cols) SELECT * FROM src") }
      } finally spark.conf.unset("spark.graft.write.direct")
    }

    def report(label: String, d: Seq[Double], s: Seq[Double]): Unit =
      println(f"$label%-20s rows=$nRows%d direct=${median(d)}%.3fs " +
        f"staged=${median(s)}%.3fs speedup=${median(s) / median(d)}%.2fx " +
        f"(direct samples: ${d.map(x => f"$x%.3f").mkString(",")} | " +
        f"staged: ${s.map(x => f"$x%.3f").mkString(",")})")

    // Interleave arms: warmup one throwaway insert per arm first.
    arm("warm_d", direct = true, partitioned = false)
    arm("warm_s", direct = false, partitioned = false)
    for (partitioned <- Seq(false, true)) {
      val label = if (partitioned) "partitioned(3 dirs)" else "unpartitioned"
      val d = arm(s"d_$partitioned", direct = true, partitioned)
      val s = arm(s"s_$partitioned", direct = false, partitioned)
      report(label, d, s)
    }
    report("replace_where",
      armReplaceWhere("rw_d", direct = true),
      armReplaceWhere("rw_s", direct = false))
    report("dynamic_overwrite",
      armDynamic("dy_d", direct = true),
      armDynamic("dy_s", direct = false))
    report("identity_insert",
      armIdentity("id_d", direct = true),
      armIdentity("id_s", direct = false))
    spark.stop()
  }
}
