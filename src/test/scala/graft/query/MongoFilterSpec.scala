package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Operator-by-operator filter semantics, mirroring the reference's
  * tests/unit/query/query-layer.test.ts layering. */
class MongoFilterSpec extends SparkTestBase {
  import spark.implicits._

  // Rows with nulls to exercise the strict-equality / null-propagation rules.
  lazy val df: DataFrame = Seq(
    (1, Some("a"), Some(10), Some(1.5)),
    (2, Some("b"), Some(20), None),
    (3, None, Some(30), Some(2.5)),
    (4, Some("a"), None, Some(3.5)),
    (5, Some("c"), Some(50), Some(4.5))
  ).toDF("id", "s", "n", "d")

  private def ids(filterJson: String): Seq[Int] =
    df.filter(MongoFilter.column(filterJson, df.schema))
      .select("id").as[Int].collect().sorted.toSeq

  test("implicit equality is strict ===") {
    assert(ids("""{"s":"a"}""") == Seq(1, 4))
  }

  test("equality with null matches null fields (JS null === null)") {
    assert(ids("""{"s":null}""") == Seq(3))
  }

  test("$ne matches null/missing fields") {
    assert(ids("""{"s":{"$ne":"a"}}""") == Seq(2, 3, 5))
  }

  test("$gt/$lte never match null; cross-type never matches") {
    assert(ids("""{"n":{"$gt":15}}""") == Seq(2, 3, 5))
    assert(ids("""{"n":{"$lte":20}}""") == Seq(1, 2))
    assert(ids("""{"n":{"$gt":"abc"}}""") == Seq())
    assert(ids("""{"s":{"$gt":1}}""") == Seq())
  }

  test("$in with null in list matches null field") {
    assert(ids("""{"s":{"$in":["a",null]}}""") == Seq(1, 3, 4))
    assert(ids("""{"s":{"$in":["b"]}}""") == Seq(2))
  }

  test("$nin: null field matches unless null is in the list") {
    assert(ids("""{"s":{"$nin":["a"]}}""") == Seq(2, 3, 5))
    assert(ids("""{"s":{"$nin":["a",null]}}""") == Seq(2, 5))
  }

  test("$and / $or / $nor / $not compose") {
    assert(ids("""{"$and":[{"n":{"$gte":10}},{"n":{"$lt":30}}]}""") == Seq(1, 2))
    assert(ids("""{"$or":[{"s":"c"},{"n":10}]}""") == Seq(1, 5))
    assert(ids("""{"$nor":[{"s":"a"},{"s":"b"}]}""") == Seq(3, 5))
    assert(ids("""{"$not":{"s":"a"}}""") == Seq(2, 3, 5))
  }

  test("conjunctive multi-field document") {
    assert(ids("""{"s":"a","n":{"$gte":5}}""") == Seq(1))
  }

  test("$regex on strings; non-string columns never match") {
    assert(ids("""{"s":{"$regex":"^[ab]$"}}""") == Seq(1, 2, 4))
    assert(ids("""{"s":{"$regex":"^A$","$options":"i"}}""") == Seq(1, 4))
    assert(ids("""{"n":{"$regex":"1"}}""") == Seq())
  }

  test("$regex ReDoS caps: long patterns rejected, >10k-char inputs never match") {
    intercept[IllegalArgumentException] {
      ids(s"""{"s":{"$$regex":"${"a" * 1001}"}}""")
    }
    val big = Seq((1, "x" * 10001), (2, "x" * 9999)).toDF("id", "s")
    val got = big.filter(MongoFilter.column("""{"s":{"$regex":"^x+$"}}""", big.schema))
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(2))
    // and under $not the capped row MATCHES (two-valued negation)
    val neg = big.filter(MongoFilter.column("""{"$not":{"s":{"$regex":"^x+$"}}}""", big.schema))
      .select("id").as[Int].collect().toSeq
    assert(neg == Seq(1))
  }

  test("$exists on declared vs undeclared fields") {
    assert(ids("""{"zzz":{"$exists":true}}""") == Seq())
    assert(ids("""{"zzz":{"$exists":false}}""") == Seq(1, 2, 3, 4, 5))
    assert(ids("""{"s":{"$exists":true}}""") == Seq(1, 2, 3, 4, 5))
  }

  test("$type is accepted but ignored, like the reference") {
    assert(ids("""{"s":{"$type":"string"}}""") == Seq(1, 2, 3, 4, 5))
  }

  test("nested dot-path filters on structs") {
    val nested = Seq(
      (1, ("x", 18)), (2, ("y", 30)), (3, ("x", 10))
    ).toDF("id", "u").withColumnRenamed("u", "user")
    val got = nested.filter(
        MongoFilter.column("""{"user._2":{"$gte":18}}""", nested.schema))
      .select("id").as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2))
  }
}
