package graft.plans

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import graft.delta.StatsAggregates

/** Metadata-only aggregate pushdown: COUNT(*)/COUNT(col)/MIN/MAX over an
  * unfiltered graft catalog table must be answered from the log's per-file
  * stats — never from the data files. The definitive proof deletes every
  * data file from disk and shows the aggregates still answer (and that a
  * query which DOES need the rows fails), so "pushed down" is a physical
  * fact here, not a plan-string assertion. */
class AggPushdownSpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)

  private var n = 0
  private def freshTable(): String = synchronized {
    n += 1; s"$cat.aggpd.t$n"
  }

  private def setup(): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.aggpd")
    ()
  }

  private def tableDir(t: String): Path = {
    val wh = GraftSql.warehousePath(spark).get
    Paths.get((wh +: t.split('.').drop(1).toSeq).mkString("/"))
  }

  /** Run `q`, return (result row, how many aggregations were answered from
    * metadata during it). */
  private def answered[A](body: => A): (A, Long) = {
    val before = StatsAggregates.answered.get()
    val r = body
    (r, StatsAggregates.answered.get() - before)
  }

  test("COUNT/MIN/MAX answered from metadata, values exact incl. nulls") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRING, d TIMESTAMP_NTZ)")
    spark.sql(s"""INSERT INTO $t VALUES
      (5, 'beta', TIMESTAMP_NTZ'2024-03-01 10:00:00'),
      (2, NULL,  TIMESTAMP_NTZ'2023-01-15 23:59:59.5'),
      (9, 'alpha', NULL),
      (NULL, 'gamma', TIMESTAMP_NTZ'2025-12-31 00:00:00')""")
    val (row, hits) = answered {
      spark.sql(s"""SELECT COUNT(*), COUNT(id), COUNT(s), MIN(id), MAX(id),
                      MIN(s), MAX(s), MIN(d), MAX(d) FROM $t""").head()
    }
    assert(hits >= 1, "aggregation was not answered from metadata")
    assert(row.getLong(0) == 4 && row.getLong(1) == 3 && row.getLong(2) == 3)
    assert(row.getLong(3) == 2 && row.getLong(4) == 9)
    assert(row.getString(5) == "alpha" && row.getString(6) == "gamma")
    assert(row.getAs[java.time.LocalDateTime](7) ==
      java.time.LocalDateTime.parse("2023-01-15T23:59:59.500"))
    assert(row.getAs[java.time.LocalDateTime](8) ==
      java.time.LocalDateTime.parse("2025-12-31T00:00"))
  }

  test("data files can be DELETED from disk and aggregates still answer") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t AS SELECT id, CAST(id % 7 AS INT) AS g FROM range(1000)")
    val dir = tableDir(t)
    val dataFiles = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toList
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(Files.delete)
    val (row, hits) = answered {
      spark.sql(s"SELECT COUNT(*), MIN(id), MAX(id), COUNT(g) FROM $t").head()
    }
    assert(hits == 1)
    assert(row.getLong(0) == 1000 && row.getLong(1) == 0 && row.getLong(2) == 999
      && row.getLong(3) == 1000)
    // a filtered aggregate needs the rows → must NOT be metadata-answered
    // (and with the files gone it can only fail)
    val (err, hits2) = answered {
      intercept[Throwable](
        spark.sql(s"SELECT COUNT(*) FROM $t WHERE g = 3").head())
    }
    assert(hits2 == 0, "filtered aggregate must not be metadata-answered")
    assert(err != null)
  }

  test("COUNT(*) stays exact under deletion vectors; MIN/MAX refuse") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t AS SELECT id FROM range(100)")
    spark.conf.set("spark.graft.sql.dml.mor", "true")
    try spark.sql(s"DELETE FROM $t WHERE id >= 90")
    finally spark.conf.unset("spark.graft.sql.dml.mor")
    val (cnt, hits) = answered {
      spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0)
    }
    assert(cnt == 90 && hits == 1)
    // deleted rows could hold the extremum: min/max must fall back to the
    // scan (which applies the DV mask) and still be right
    val (row, hits2) = answered {
      spark.sql(s"SELECT MIN(id), MAX(id) FROM $t").head()
    }
    assert(hits2 == 0, "MIN/MAX under DVs must not be metadata-answered")
    assert(row.getLong(0) == 0 && row.getLong(1) == 89)
  }

  test("GROUP BY, DISTINCT, SUM, and double MIN/MAX are never pushed") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t AS SELECT id, CAST(id AS DOUBLE) AS x, " +
      s"CAST(id % 3 AS INT) AS g FROM range(30)")
    val (_, h1) = answered {
      spark.sql(s"SELECT g, COUNT(*) FROM $t GROUP BY g").collect()
    }
    val (_, h2) = answered {
      spark.sql(s"SELECT COUNT(DISTINCT g) FROM $t").head()
    }
    val (_, h3) = answered { spark.sql(s"SELECT SUM(id) FROM $t").head() }
    val (mx, h4) = answered {
      spark.sql(s"SELECT MAX(x) FROM $t").head().getDouble(0)
    }
    assert(h1 == 0 && h2 == 0 && h3 == 0 && h4 == 0)
    assert(mx == 29.0)
  }

  test("partition-column COUNT/MIN/MAX answer from partitionValues, exact under DVs") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, p INT, s STRING) PARTITIONED BY (p, s)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 4 AS INT), " +
      s"CASE WHEN id % 5 = 0 THEN NULL ELSE CONCAT('g', id % 3) END FROM range(400)")
    val (row, hits) = answered {
      spark.sql(s"SELECT MIN(p), MAX(p), COUNT(p), MIN(s), MAX(s), COUNT(s) FROM $t").head()
    }
    assert(hits == 1, "partition-column aggregates were not metadata-answered")
    assert(row.getInt(0) == 0 && row.getInt(1) == 3 && row.getLong(2) == 400)
    assert(row.getString(3) == "g0" && row.getString(4) == "g2" && row.getLong(5) == 320)
    // DV delete wipes partition p=3 entirely and thins others: partition
    // aggregates stay exact because surviving-row counts gate each file
    spark.conf.set("spark.graft.sql.dml.mor", "true")
    try spark.sql(s"DELETE FROM $t WHERE p = 3 OR id < 8")
    finally spark.conf.unset("spark.graft.sql.dml.mor")
    val (row2, hits2) = answered {
      spark.sql(s"SELECT MIN(p), MAX(p), COUNT(p), COUNT(*) FROM $t").head()
    }
    assert(hits2 == 1, "partition aggregates under DVs were not metadata-answered")
    assert(row2.getInt(0) == 0 && row2.getInt(1) == 2)
    assert(row2.getLong(2) == 294 && row2.getLong(3) == 294)
  }

  test("GROUP BY partition columns answers per group; empty groups vanish") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, p INT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 4 AS INT) FROM range(400)")
    val (rows, hits) = answered {
      spark.sql(s"SELECT p, COUNT(*) AS c, MIN(id) AS lo, MAX(id) AS hi FROM $t " +
        s"GROUP BY p ORDER BY p").collect()
    }
    assert(hits == 1, "grouped partition aggregates were not metadata-answered")
    assert(rows.length == 4)
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(rows.forall(_.getLong(1) == 100))
    assert(rows.head.getLong(2) == 0 && rows.head.getLong(3) == 396)
    // wipe partition 3 via DVs: its group must disappear, counts stay exact
    spark.conf.set("spark.graft.sql.dml.mor", "true")
    try spark.sql(s"DELETE FROM $t WHERE p = 3 OR id = 0")
    finally spark.conf.unset("spark.graft.sql.dml.mor")
    val (rows2, hits2) = answered {
      spark.sql(s"SELECT p, COUNT(*) AS c FROM $t GROUP BY p ORDER BY p").collect()
    }
    assert(hits2 == 1, "grouped aggregates under DVs were not metadata-answered")
    assert(rows2.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 99), (1, 100), (2, 100)))
    // grouping by a DATA column needs the rows → never metadata-answered
    val (_, hits3) = answered {
      spark.sql(s"SELECT id % 2, COUNT(*) FROM $t GROUP BY id % 2").collect()
    }
    assert(hits3 == 0, "data-column GROUP BY must not be metadata-answered")
    // DISTINCT over a partition column = GROUP BY with zero aggregates:
    // answered as the group keys alone (p=3 is gone)
    val (dRows, hits4) = answered {
      spark.sql(s"SELECT DISTINCT p FROM $t ORDER BY p").collect()
    }
    assert(hits4 == 1, "partition-column DISTINCT was not metadata-answered")
    assert(dRows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
  }

  test("grouped aggregates answer with the files deleted from disk") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, g STRING) PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO $t SELECT id, CASE WHEN id % 3 = 0 THEN NULL " +
      s"ELSE CONCAT('s', id % 3) END FROM range(90)")
    val dir = tableDir(t)
    val dataFiles = Files.walk(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toList
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(Files.delete)
    val (rows, hits) = answered {
      spark.sql(s"SELECT g, COUNT(*) AS c, MIN(id) AS lo FROM $t " +
        s"GROUP BY g ORDER BY g NULLS FIRST").collect()
    }
    assert(hits == 1)
    // null partition groups like any other value (30 ids ≡ 0 mod 3)
    assert(rows.length == 3)
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) == 30 && rows.head.getLong(2) == 0)
    assert(rows(1).getString(0) == "s1" && rows(1).getLong(1) == 30 && rows(1).getLong(2) == 1)
    assert(rows(2).getString(0) == "s2" && rows(2).getLong(1) == 30 && rows(2).getLong(2) == 2)
  }

  test("time travel aggregates answer from the travelled snapshot") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t AS SELECT id FROM range(10)") // v0+v1 (create+CTAS insert)
    val v = spark.sql(s"SELECT MAX(version) FROM graft_history('${t.stripPrefix(s"$cat.")}')")
      .head().getLong(0)
    spark.sql(s"INSERT INTO $t SELECT id + 100 FROM range(5)")
    val (row, hits) = answered {
      spark.sql(s"SELECT COUNT(*), MAX(id) FROM $t VERSION AS OF $v").head()
    }
    assert(hits == 1)
    assert(row.getLong(0) == 10 && row.getLong(1) == 9)
    val (row2, hits2) = answered {
      spark.sql(s"SELECT COUNT(*), MAX(id) FROM $t").head()
    }
    assert(hits2 == 1)
    assert(row2.getLong(0) == 15 && row2.getLong(1) == 104)
  }
}
