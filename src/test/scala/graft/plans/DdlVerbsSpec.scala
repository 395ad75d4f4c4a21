package graft.plans

import graft.SparkTestBase

/** Catalog DDL verbs beyond CREATE/DROP: atomic replace and truncate. */
class DdlVerbsSpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)

  private def setup(): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ddl")
    ()
  }

  test("CREATE OR REPLACE TABLE swaps schema and content") {
    setup()
    val t = s"$cat.ddl.ror"
    spark.sql(s"CREATE TABLE $t AS SELECT id FROM range(5)")
    spark.sql(s"CREATE OR REPLACE TABLE $t AS SELECT id, id * 2 AS d FROM range(3)")
    val df = spark.sql(s"SELECT * FROM $t ORDER BY id")
    assert(df.schema.fieldNames.toSeq == Seq("id", "d"))
    assert(df.count() == 3)
  }

  test("TRUNCATE TABLE removes every row in one commit; history survives") {
    setup()
    val t = s"$cat.ddl.trunc"
    spark.sql(s"CREATE TABLE $t AS SELECT id, id % 3 AS g FROM range(100)")
    val vBefore = {
      val path = GraftSql.warehousePath(spark).get + "/ddl/trunc"
      graft.delta.DeltaTable.forPath(spark, path).version
    }
    spark.sql(s"TRUNCATE TABLE $t")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 0)
    // schema retained, table writable again
    spark.sql(s"INSERT INTO $t VALUES (7, 1)")
    assert(spark.sql(s"SELECT id FROM $t").head().getLong(0) == 7)
    // the pre-truncate state is still time-travelable
    val pre = spark.sql(s"SELECT count(*) FROM $t VERSION AS OF $vBefore").head().getLong(0)
    assert(pre == 100)
  }
}
