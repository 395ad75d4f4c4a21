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

  test("column comments: CREATE carries them, COMMENT ON / ALTER COLUMN updates them") {
    setup()
    val t = s"$cat.ddl.cmt"
    spark.sql(s"CREATE TABLE $t (id BIGINT COMMENT 'the key', v STRING)")
    def commentOf(c: String): String =
      spark.table(t).schema(c).getComment().getOrElse("")
    assert(commentOf("id") == "the key")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v COMMENT 'payload'")
    assert(commentOf("v") == "payload")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id COMMENT 'renumbered'")
    assert(commentOf("id") == "renumbered")
  }

  test("ALTER COLUMN SET/DROP NOT NULL: tighten validates, writes enforce values") {
    setup()
    val t = s"$cat.ddl.nn"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, NULL)")
    // The NATIVE verb: Spark's CheckAnalysis refuses nullable→non-nullable
    // for every V2 table, so this only resolves because the test session is
    // extension-built and GraftAlterNotNullRule rewrote the plan. Tightening
    // over existing NULLs still refuses — with OUR census proof, not the
    // analyzer's blanket error.
    def isValidation(e: Throwable): Boolean = e != null &&
      (e.isInstanceOf[graft.delta.ValidationException] || isValidation(e.getCause))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN v SET NOT NULL")
    }
    assert(isValidation(e), s"expected the NULL-census refusal, got: $e")
    spark.sql(s"UPDATE $t SET v = 'b' WHERE v IS NULL")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v SET NOT NULL")
    assert(!spark.table(t).schema("v").nullable)
    // mixed specs (comment alongside nullability) are NOT intercepted:
    // Spark's own refusal still applies, and the table is untouched
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id COMMENT 'k' SET NOT NULL")
    }
    assert(!isValidation(e3))
    // future writes enforce: a NULL value refuses, nothing commits
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (3, NULL)")
    }
    assert(e2.getMessage != null)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 2)
    // relax again: NULLs flow
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v DROP NOT NULL")
    spark.sql(s"INSERT INTO $t VALUES (3, NULL)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3)
  }

  test("graft_set_not_null tightens via pure SQL (incl. existing-NULL refusal)") {
    setup()
    val t = s"$cat.ddl.nnsql"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, NULL)")
    // tightening over existing NULLs refuses — declaration must be true
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_set_not_null('ddl.nnsql', 'v')").collect()
    }
    assert(e.getMessage.contains("NULL"))
    spark.sql(s"UPDATE $t SET v = 'b' WHERE v IS NULL")
    val row = spark.sql(s"SELECT * FROM graft_set_not_null('ddl.nnsql', 'v')").head()
    assert(row.getString(0) == "v" && !row.getBoolean(1))
    assert(!spark.table(t).schema("v").nullable)
    // writes enforce from this commit on
    val e2 = intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (3, NULL)") }
    assert(e2.getMessage != null)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 2)
    // the TVF's relax arm mirrors DROP NOT NULL
    spark.sql(s"SELECT * FROM graft_set_not_null('ddl.nnsql', 'v', 'true')").collect()
    spark.sql(s"INSERT INTO $t VALUES (3, NULL)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3)
  }

  test("ALTER TABLE UNSET TBLPROPERTIES removes the key cleanly") {
    setup()
    val t = s"$cat.ddl.unset"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('k1' = 'v1')")
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('k1')")
    val dt = graft.delta.DeltaTable.forPath(spark,
      GraftSql.warehousePath(spark).get + "/ddl/unset")
    assert(!dt.metaSnapshot().configuration.contains("k1"))
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
