package graft.sources

import graft.SparkTestBase
import graft.plans.GraftSql

/**
 * Property check: for ANY row set, null pattern, and partitioning choice,
 * the DIRECT batch write (task-side parquet into the final layout, one
 * metadata commit) and the V1 STAGING path are observationally
 * IDENTICAL — same rows back, same partition-pruned counts. The two
 * paths share a commit core but diverge in the entire file-producing
 * machinery, so this pins the seam the round-11 rewiring moved. Cases
 * come from a fixed-seed RNG (reproducible), with Hive-escaping-hostile
 * partition values (spaces, '=', empty string) always in the pool.
 */
case class DwRec(id: Long, s: Option[String], v: Option[Double], p: String)

class DirectWritePropertySpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)
  private def sql(q: String) = spark.sql(q)

  test("property: direct and staged writes are observationally identical (12 seeded cases)") {
    sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dwprop")
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val strings = Vector("x", "y", "", "He said \"hi\"", "a/b=c d")
    val doubles = Vector(0.0, -1.5, 2.25, Double.MaxValue)
    val parts = Vector("p1", "p 2", "p=3", "")
    for (caseNo <- 1 to 12) {
      val partitioned = rnd.nextBoolean()
      val rows = Seq.fill(20 + rnd.nextInt(40))(DwRec(
        rnd.nextInt(1000).toLong,
        if (rnd.nextBoolean()) Some(strings(rnd.nextInt(strings.size))) else None,
        if (rnd.nextBoolean()) Some(doubles(rnd.nextInt(doubles.size))) else None,
        parts(rnd.nextInt(parts.size))))
      val dt = s"$cat.dwprop.d$caseNo"
      val st = s"$cat.dwprop.s$caseNo"
      val part = if (partitioned) " PARTITIONED BY (p)" else ""
      val ddl = "(id BIGINT, s STRING, v DOUBLE, p STRING)"
      sql(s"CREATE TABLE $dt $ddl$part")
      sql(s"CREATE TABLE $st $ddl$part")
      rows.toDF().createOrReplaceTempView("dw_src")
      sql(s"INSERT INTO $dt SELECT id, s, v, p FROM dw_src")
      spark.conf.set("spark.graft.write.direct", "false")
      try sql(s"INSERT INTO $st SELECT id, s, v, p FROM dw_src")
      finally spark.conf.unset("spark.graft.write.direct")

      def canon(t: String): Seq[Seq[Any]] =
        sql(s"SELECT id, s, v, p FROM $t ORDER BY id, s, v, p")
          .collect().toSeq.map(_.toSeq.map {
            case d: Double => d.toString
            case x => x
          })
      assert(canon(dt) == canon(st),
        s"case $caseNo (partitioned=$partitioned): direct != staged")
      if (partitioned) {
        for (pv <- parts) {
          val q = s"WHERE p = '${pv.replace("'", "''")}'"
          assert(
            sql(s"SELECT count(*) FROM $dt $q").head().getLong(0) ==
              sql(s"SELECT count(*) FROM $st $q").head().getLong(0),
            s"case $caseNo: pruned count differs for partition value '$pv'")
        }
      }
    }
  }
}
