package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.sources.DeltaRelation

/** LIMIT pushdown: an un-filtered `LIMIT k` must trim the planned file
  * list to a log-order prefix whose provable survivor counts cover k —
  * on a million-file table, `SELECT * FROM t LIMIT 10` should plan over
  * one file, not build a parquet relation across all of them. The
  * definitive test deletes the trailing files from disk: a query that
  * still answers cannot have planned over them. */
class LimitPushdownSpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)

  private var n = 0
  private def freshTable(): String = synchronized { n += 1; s"$cat.lim.t$n" }

  private def setup(): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lim")
    ()
  }

  private def tableDir(t: String): String = {
    val wh = GraftSql.warehousePath(spark).get
    (wh +: t.split('.').drop(1).toSeq).mkString("/")
  }

  private def skipped[A](body: => A): (A, Long) = {
    val before = DeltaRelation.limitSkipped.get()
    val r = body
    (r, DeltaRelation.limitSkipped.get() - before)
  }

  test("LIMIT plans only a covering file prefix; trailing files can be gone") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRING)")
    (0 until 8).foreach(i =>
      spark.sql(s"INSERT INTO $t SELECT id + ${i * 10}, CONCAT('r', id) FROM range(10)"))
    val (rows, sk) = skipped { spark.sql(s"SELECT id FROM $t LIMIT 3").collect() }
    assert(rows.length == 3)
    assert(sk >= 6, s"expected >=6 of 8 files trimmed for LIMIT 3, got $sk")
    // physical proof: remove every data file the prefix does not need
    val delta = graft.delta.DeltaTable.forPath(spark, tableDir(t))
    val doomed = delta.snapshot().activeFiles.drop(2)
    assert(doomed.nonEmpty)
    doomed.foreach(f => Files.delete(Paths.get(tableDir(t), f.path)))
    val (rows2, _) = skipped { spark.sql(s"SELECT id FROM $t LIMIT 3").collect() }
    assert(rows2.length == 3)
  }

  test("LIMIT with a predicate trims nothing (filtered rows need the scan)") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO $t SELECT id + ${i * 10} FROM range(10)"))
    // the matching rows live in the LAST file — a limit trim would lose them
    val (rows, sk) = skipped {
      spark.sql(s"SELECT id FROM $t WHERE id >= 35 LIMIT 3").collect()
    }
    assert(sk == 0, s"LIMIT under a predicate must not trim files, trimmed $sk")
    assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(35L, 36L, 37L, 38L, 39L)))
    assert(rows.length == 3)
  }

  test("LIMIT counts DV survivors, not raw rows") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(10)")          // file 1: ids 0-9
    spark.sql(s"INSERT INTO $t SELECT id + 10 FROM range(10)")     // file 2: ids 10-19
    spark.conf.set("spark.graft.sql.dml.mor", "true")
    try spark.sql(s"DELETE FROM $t WHERE id < 9")                  // file 1 keeps 1 row
    finally spark.conf.unset("spark.graft.sql.dml.mor")
    // LIMIT 5 needs both files: file 1 only PROVABLY yields 1 survivor
    val (rows, _) = skipped { spark.sql(s"SELECT id FROM $t LIMIT 5").collect() }
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).forall(id => id == 9 || id >= 10))
    // LIMIT larger than the table returns every surviving row
    val (all, _) = skipped { spark.sql(s"SELECT id FROM $t LIMIT 50").collect() }
    assert(all.map(_.getLong(0)).toSet == (9L to 19L).toSet)
  }
}
