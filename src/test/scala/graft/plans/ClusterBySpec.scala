package graft.plans

import graft.SparkTestBase

/**
 * `CREATE TABLE ... CLUSTER BY (cols)` stores a LAYOUT INTENT (not a
 * partitioning): `graft_zorder(t)` with no column list re-clusters by the
 * declared columns (Morton-interleaved sort + zone-map stats), so point
 * and range predicates on them prune files. `ALTER TABLE ... CLUSTER BY`
 * updates the intent; CLUSTER BY NONE drops it.
 */
class ClusterBySpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)
  private def sql(q: String) = spark.sql(q)

  private var n = 0
  private def freshTable(): String = synchronized {
    n += 1; s"$cat.clby.t$n"
  }
  private def setup(): Unit = {
    sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.clby"); ()
  }
  private def tablePath(t: String): String =
    GraftSql.warehousePath(spark).get + "/clby/" + t.split('.').last

  test("CLUSTER BY is stored as layout intent and graft_zorder(t) uses it") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (a BIGINT, b BIGINT, s STRING) CLUSTER BY (a, b)")
    // many small unclustered files
    (0 until 8).foreach(i =>
      sql(s"INSERT INTO $t SELECT id, id % 100, CAST(id AS STRING) " +
        s"FROM range(${i * 1000}, ${i * 1000 + 1000})"))
    val dt = graft.delta.DeltaTable.forPath(spark, tablePath(t))
    assert(dt.metaSnapshot().configuration.get("graft.clusterBy").contains("a,b"))

    val r = sql(s"SELECT * FROM graft_zorder('$t')").head()
    assert(r.getLong(0) >= 8, s"files_before: ${r.getLong(0)}")
    assert(r.getLong(1) < r.getLong(0), s"files_after: ${r.getLong(1)}")
    assert(sql(s"SELECT count(*), sum(a) FROM $t").head().toSeq ==
      Seq(8000L, (0L until 8000L).sum))
  }

  test("graft_zorder on an undeclared table still requires explicit columns") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (a BIGINT)")
    sql(s"INSERT INTO $t SELECT id FROM range(10)")
    val e = intercept[Exception] { sql(s"SELECT * FROM graft_zorder('$t')").collect() }
    assert(e.getMessage.contains("CLUSTER BY"))
    // explicit columns keep working
    sql(s"SELECT * FROM graft_zorder('$t', 'a')").collect()
  }

  test("ALTER TABLE CLUSTER BY updates the intent; CLUSTER BY NONE drops it") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (a BIGINT, b BIGINT) CLUSTER BY (a)")
    sql(s"ALTER TABLE $t CLUSTER BY (b)")
    val dt = graft.delta.DeltaTable.forPath(spark, tablePath(t))
    assert(dt.metaSnapshot().configuration.get("graft.clusterBy").contains("b"))
    sql(s"ALTER TABLE $t CLUSTER BY NONE")
    assert(!dt.metaSnapshot().configuration.contains("graft.clusterBy"))
  }

  test("CLUSTER BY cannot combine with PARTITIONED BY, and validates columns") {
    setup()
    val t1 = freshTable()
    val e1 = intercept[Exception] {
      sql(s"CREATE TABLE $t1 (a BIGINT, p STRING) PARTITIONED BY (p) CLUSTER BY (a)")
    }
    assert(e1.getMessage != null)
    val t2 = freshTable()
    val e2 = intercept[Exception] {
      sql(s"CREATE TABLE $t2 (a BIGINT) CLUSTER BY (nope)")
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("zone-map pruning bites after clustering: a point predicate plans fewer files") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (a BIGINT, s STRING) CLUSTER BY (a)")
    // interleaved inserts: every file spans nearly the whole key range,
    // so pre-cluster zone maps cannot prune
    (0 until 8).foreach(i =>
      sql(s"INSERT INTO $t SELECT id * 8 + $i, CAST(id AS STRING) FROM range(1000)"))
    val dt = graft.delta.DeltaTable.forPath(spark, tablePath(t))
    def plannedFiles(): Int = {
      val df = sql(s"SELECT * FROM $t WHERE a BETWEEN 100 AND 120")
      df.collect() // execute to settle runtime filters
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      val scan = df.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }.head.scan
      scan.toBatch.planInputPartitions().length
    }
    val before = plannedFiles()
    sql(s"SELECT * FROM graft_zorder('$t')").collect()
    val after = plannedFiles()
    assert(after < before,
      s"clustering should shrink the planned file set: $before -> $after")
    assert(sql(s"SELECT count(*) FROM $t WHERE a BETWEEN 100 AND 120")
      .head().getLong(0) == 21)
  }
}
