package graft.sources

import graft.SparkTestBase
import graft.plans.GraftSql

/**
 * Namespace DDL through the catalog: properties/comments persist in a
 * JSON sidecar inside the namespace directory, ALTER NAMESPACE SET/UNSET
 * works (round 12 — previously refused), and the sidecar never surfaces
 * as a table or blocks an empty-namespace drop.
 */
class NamespaceSpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)
  private def sql(q: String) = spark.sql(q)

  test("CREATE NAMESPACE persists COMMENT and PROPERTIES; DESCRIBE reads them back") {
    sql(s"CREATE NAMESPACE $cat.nsp1 COMMENT 'docs corpora' " +
      "WITH PROPERTIES ('team' = 'data-eng')")
    val desc = sql(s"DESCRIBE NAMESPACE EXTENDED $cat.nsp1")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).mkString("\n")
    assert(desc.contains("docs corpora"), s"missing comment in:\n$desc")
    assert(desc.contains("team") && desc.contains("data-eng"),
      s"missing property in:\n$desc")
  }

  test("ALTER NAMESPACE SET/UNSET PROPERTIES and SET COMMENT round-trip") {
    sql(s"CREATE NAMESPACE $cat.nsp2")
    sql(s"ALTER NAMESPACE $cat.nsp2 SET PROPERTIES ('tier' = 'gold', 'k' = 'v')")
    sql(s"COMMENT ON NAMESPACE $cat.nsp2 IS 'renamed later'")
    val d1 = sql(s"DESCRIBE NAMESPACE EXTENDED $cat.nsp2")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).mkString("\n")
    assert(d1.contains("tier") && d1.contains("gold") && d1.contains("renamed later"))
    sql(s"ALTER NAMESPACE $cat.nsp2 UNSET PROPERTIES ('k')")
    val d2 = sql(s"DESCRIBE NAMESPACE EXTENDED $cat.nsp2")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).mkString("\n")
    assert(d2.contains("tier") && !d2.contains("|k|"),
      s"k should be unset in:\n$d2")
  }

  test("the properties sidecar is not a table and does not block empty-namespace DROP") {
    sql(s"CREATE NAMESPACE $cat.nsp3 WITH PROPERTIES ('a' = 'b')")
    assert(sql(s"SHOW TABLES IN $cat.nsp3").collect().isEmpty)
    sql(s"CREATE TABLE $cat.nsp3.t1 (id BIGINT)")
    val e = intercept[Exception] { sql(s"DROP NAMESPACE $cat.nsp3") }
    assert(e.getMessage != null) // non-empty: the TABLE blocks, as before
    sql(s"DROP TABLE $cat.nsp3.t1")
    sql(s"DROP NAMESPACE $cat.nsp3") // sidecar alone must not block
    assert(sql(s"SHOW NAMESPACES IN $cat").collect()
      .forall(r => r.getString(0) != "nsp3"))
  }
}
