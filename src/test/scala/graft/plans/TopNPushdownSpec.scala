package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.sources.DeltaRelation

/** TOP-N pushdown: `ORDER BY c LIMIT k` (no predicate) must trim the
  * planned file list to the zone-map cover of the k extreme rows — the
  * "latest k events" pattern that otherwise scans every file of a huge
  * table. Physical proof: the non-cover files are deleted from disk and
  * the query still answers correctly. */
class TopNPushdownSpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)

  private var n = 0
  private def freshTable(): String = synchronized { n += 1; s"$cat.topn.t$n" }

  private def setup(): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.topn")
    ()
  }

  private def tableDir(t: String): String = {
    val wh = GraftSql.warehousePath(spark).get
    (wh +: t.split('.').drop(1).toSeq).mkString("/")
  }

  private def skipped[A](body: => A): (A, Long) = {
    val before = DeltaRelation.topNSkipped.get()
    val r = body
    (r, DeltaRelation.topNSkipped.get() - before)
  }

  test("ORDER BY LIMIT keeps only the zone-map cover, both directions") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRING)")
    // 8 files with DISJOINT id ranges [0,10) [10,20) ... [70,80)
    // (range(..., 1) = one input partition = one written file per insert)
    (0 until 8).foreach(i =>
      spark.sql(s"INSERT INTO $t SELECT id, CONCAT('r', id) FROM " +
        s"range(${i * 10}, ${i * 10 + 10}, 1, 1)"))
    val (asc, skA) = skipped {
      spark.sql(s"SELECT id FROM $t ORDER BY id LIMIT 3").collect()
    }
    assert(asc.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(skA == 7, s"expected 7 of 8 files trimmed for ascending top-3, got $skA")
    val (desc, skD) = skipped {
      spark.sql(s"SELECT id FROM $t ORDER BY id DESC LIMIT 3").collect()
    }
    assert(desc.map(_.getLong(0)).toSeq == Seq(79L, 78L, 77L))
    assert(skD == 7, s"expected 7 of 8 files trimmed for descending top-3, got $skD")
    // physical proof for DESC: only the [70,80) file is needed
    val delta = graft.delta.DeltaTable.forPath(spark, tableDir(t))
    val doomed = delta.snapshot().activeFiles.dropRight(1)
    assert(doomed.size == 7)
    doomed.foreach(f => Files.delete(Paths.get(tableDir(t), f.path)))
    val (desc2, _) = skipped {
      spark.sql(s"SELECT id FROM $t ORDER BY id DESC LIMIT 3").collect()
    }
    assert(desc2.map(_.getLong(0)).toSeq == Seq(79L, 78L, 77L))
  }

  test("null ordering is honoured: nulls-first rows come from null files") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id + 100 FROM range(0, 10, 1, 1)")      // v 100-109
    spark.sql(s"INSERT INTO $t SELECT id + 10, NULL FROM range(0, 3, 1, 1)")      // 3 null v
    spark.sql(s"INSERT INTO $t SELECT id + 20, id + 200 FROM range(0, 10, 1, 1)") // v 200-209
    // ASC default = NULLS FIRST: top-2 are null rows; only the null file needed
    val (r1, sk1) = skipped {
      spark.sql(s"SELECT v FROM $t ORDER BY v LIMIT 2").collect()
    }
    assert(r1.forall(_.isNullAt(0)))
    assert(sk1 == 2, s"expected only the null-bearing file kept, trimmed $sk1")
    // ASC LIMIT 5: 3 nulls + 2 smallest non-null (100, 101)
    val (r2, _) = skipped {
      spark.sql(s"SELECT v FROM $t ORDER BY v LIMIT 5").collect()
    }
    assert(r2.count(_.isNullAt(0)) == 3)
    assert(r2.filterNot(_.isNullAt(0)).map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L))
    // DESC default = NULLS LAST: top-2 are the largest non-null
    val (r3, sk3) = skipped {
      spark.sql(s"SELECT v FROM $t ORDER BY v DESC LIMIT 2").collect()
    }
    assert(r3.map(_.getLong(0)).toSeq == Seq(209L, 208L))
    assert(sk3 == 2, s"expected only the high-range file kept, trimmed $sk3")
  }

  test("DVs and predicates disable the trim; results stay correct") {
    setup()
    val t = freshTable()
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(0, 10, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id + 10 FROM range(0, 10, 1, 1)")
    spark.conf.set("spark.graft.sql.dml.mor", "true")
    try spark.sql(s"DELETE FROM $t WHERE id IN (0, 1)")
    finally spark.conf.unset("spark.graft.sql.dml.mor")
    // deleted rows could have been the extremum: trim must refuse under DVs
    val (r, sk) = skipped {
      spark.sql(s"SELECT id FROM $t ORDER BY id LIMIT 2").collect()
    }
    assert(sk == 0, s"top-N under DVs must not trim files, trimmed $sk")
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val (r2, sk2) = skipped {
      spark.sql(s"SELECT id FROM $t WHERE id >= 15 ORDER BY id LIMIT 2").collect()
    }
    assert(sk2 == 0)
    assert(r2.map(_.getLong(0)).toSeq == Seq(15L, 16L))
  }
}
