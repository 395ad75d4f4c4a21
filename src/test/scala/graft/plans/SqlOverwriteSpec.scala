package graft.plans

import graft.SparkTestBase

/** SQL routes onto the predicate-scoped overwrite primitives:
  * `INSERT INTO ... REPLACE WHERE`, static `INSERT OVERWRITE ...
  * PARTITION`, dynamic-mode `INSERT OVERWRITE`, and the
  * `DataFrameWriterV2.overwritePartitions()` API. */
class SqlOverwriteSpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)

  private def sql(q: String) = spark.sql(q)

  private var n = 0
  private def freshTable(): String = synchronized {
    n += 1; s"$cat.ow.t$n"
  }

  private def setup(): Unit = {
    sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ow")
    ()
  }

  test("INSERT INTO ... REPLACE WHERE swaps exactly the matching region") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t AS SELECT id, id % 5 AS g, 'old' AS s FROM range(100)")
    sql(s"INSERT INTO $t REPLACE WHERE g = 2 SELECT id + 1000, 2L, 'new' FROM range(3)")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 83)
    assert(sql(s"SELECT count(*) FROM $t WHERE g = 2").head().getLong(0) == 3)
    assert(sql(s"SELECT count(*) FROM $t WHERE s = 'old'").head().getLong(0) == 80)
  }

  test("REPLACE WHERE refuses rows outside the region, atomically") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t AS SELECT id, id % 5 AS g FROM range(10)")
    val e = intercept[Exception] {
      sql(s"INSERT INTO $t REPLACE WHERE g = 2 SELECT 777L, 4L")
    }
    // direct path (round-12): the task-side region predicate aborts the
    // write ("must satisfy the replacement condition"); the staged path
    // words it "outside the replaced region" — both are the same refusal
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("outside the replaced region") ||
      msg.contains("satisfy the replacement condition"), msg)
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 10)
  }

  test("REPLACE WHERE with a range predicate") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t AS SELECT id, CAST(id AS DOUBLE) AS v FROM range(20)")
    sql(s"INSERT INTO $t REPLACE WHERE id >= 5 AND id < 10 " +
      s"SELECT id, -1.0 FROM range(5, 10)")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 20)
    assert(sql(s"SELECT count(*) FROM $t WHERE v = -1.0").head().getLong(0) == 5)
    assert(sql(s"SELECT sum(v) FROM $t WHERE id < 5 OR id >= 10").head().getDouble(0) ==
      (0 until 20).filter(i => i < 5 || i >= 10).sum.toDouble)
  }

  test("static INSERT OVERWRITE ... PARTITION replaces exactly that partition") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT, s STRING, p STRING) PARTITIONED BY (p)")
    sql(s"INSERT INTO $t VALUES (1,'a','x'), (2,'b','x'), (3,'c','y')")
    sql(s"INSERT OVERWRITE $t PARTITION (p = 'x') VALUES (10, 'new')")
    val rows = sql(s"SELECT id, s, p FROM $t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((3L, "c", "y"), (10L, "new", "x")))
  }

  test("dynamic-mode INSERT OVERWRITE replaces only partitions present in the input") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT, p STRING) PARTITIONED BY (p)")
    sql(s"INSERT INTO $t VALUES (1,'x'), (2,'x'), (3,'y'), (4,'z')")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      sql(s"INSERT OVERWRITE $t VALUES (10L, 'x'), (11L, 'y')")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val rows = sql(s"SELECT id, p FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((4L, "z"), (10L, "x"), (11L, "y")))
  }

  test("df.writeTo(t).overwritePartitions() drives the same one-commit path") {
    setup()
    import spark.implicits._
    val t = freshTable()
    sql(s"CREATE TABLE $t (id BIGINT, p STRING) PARTITIONED BY (p)")
    sql(s"INSERT INTO $t VALUES (1,'x'), (2,'y')")
    Seq((20L, "y"), (21L, "y")).toDF("id", "p").writeTo(t).overwritePartitions()
    val rows = sql(s"SELECT id, p FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "x"), (20L, "y"), (21L, "y")))
  }

  test("plain INSERT OVERWRITE (static, no spec) still truncate-overwrites") {
    setup()
    val t = freshTable()
    sql(s"CREATE TABLE $t AS SELECT id FROM range(10)")
    sql(s"INSERT OVERWRITE $t SELECT id FROM range(3)")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3)
  }
}
