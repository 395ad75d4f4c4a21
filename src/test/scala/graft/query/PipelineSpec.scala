package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Mirrors the reference's aggregation fixtures
  * (tests/unit/query/aggregation.test.ts:24-80 — Sale rows, total qty 23). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  // Sale { product, category, quantity, price, region, tags }
  lazy val sales = Seq(
    ("laptop", "electronics", 3, 999.99, "north", Seq("tech", "popular")),
    ("mouse", "electronics", 10, 24.99, "south", Seq("tech")),
    ("desk", "furniture", 2, 299.99, "north", Seq("office")),
    ("chair", "furniture", 5, 89.99, "south", Seq("office", "popular")),
    ("monitor", "electronics", 2, 449.99, "north", Seq("tech")),
    ("lamp", "furniture", 1, 39.99, "south", Seq())
  ).toDF("product", "category", "quantity", "price", "region", "tags")

  test("$group with $sum over all docs (total quantity 23)") {
    val out = Pipeline.run(sales,
      """[{"$group":{"_id":null,"total":{"$sum":"$quantity"}}}]""")
    assert(out.select("total").as[Long].head() == 23)
  }

  test("$match + $group + $sort") {
    val out = Pipeline.run(sales,
      """[{"$match":{"category":"electronics"}},
        | {"$group":{"_id":"$region","n":{"$sum":1},"qty":{"$sum":"$quantity"}}},
        | {"$sort":{"_id":1}}]""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("north", 2L, 5L), ("south", 1L, 10L)))
  }

  test("$sum with constant operand = count * c") {
    val out = Pipeline.run(sales,
      """[{"$group":{"_id":"$category","double_count":{"$sum":2}}},
        | {"$sort":{"_id":1}}]""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("electronics", 6L), ("furniture", 6L)))
  }

  test("$avg / $min / $max / $stdDevPop") {
    val out = Pipeline.run(sales,
      """[{"$group":{"_id":"$category","avg_q":{"$avg":"$quantity"},
        |  "min_p":{"$min":"$price"},"max_p":{"$max":"$price"},
        |  "sd":{"$stdDevPop":"$quantity"}}},
        | {"$sort":{"_id":1}}]""".stripMargin)
    val e = out.filter($"_id" === "electronics").head()
    assert(e.getDouble(1) == 5.0) // (3+10+2)/3
    assert(e.getDouble(2) == 24.99 && e.getDouble(3) == 999.99)
    assert(math.abs(e.getDouble(4) - math.sqrt((4.0 + 25.0 + 9.0) / 3)) < 1e-9)
  }

  test("$unwind + $group counts tags; preserve flag keeps empty") {
    val out = Pipeline.run(sales,
      """[{"$unwind":"$tags"},
        | {"$group":{"_id":"$tags","n":{"$sum":1}}},
        | {"$sort":{"_id":1}}]""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("office", 2L), ("popular", 2L), ("tech", 3L)))
    // lamp (empty tags) is dropped without preserve, kept with it
    assert(Pipeline.run(sales, """[{"$unwind":"$tags"}]""").count() == 7)
    val kept = Pipeline.run(sales,
      """[{"$unwind":{"path":"$tags","preserveNullAndEmptyArrays":true}}]""")
    assert(kept.count() == 8)
    assert(kept.filter($"product" === "lamp").select("tags").head().isNullAt(0))
  }

  test("$push keeps values; $addToSet dedups (sorted normalization)") {
    val out = Pipeline.run(sales,
      """[{"$unwind":"$tags"},
        | {"$group":{"_id":null,"all":{"$push":"$tags"},"set":{"$addToSet":"$tags"}}}]""".stripMargin)
    val r: Row = out.head()
    assert(r.getSeq[String](1).size == 7)
    assert(r.getSeq[String](2).sorted == Seq("office", "popular", "tech"))
  }

  test("$project + $limit + $skip compose") {
    val out = Pipeline.run(sales,
      """[{"$sort":{"price":-1}},
        | {"$skip":1},{"$limit":2},
        | {"$project":{"product":1,"price":1}}]""".stripMargin)
    assert(out.columns.toSeq == Seq("product", "price"))
    assert(out.select("product").as[String].collect().toSeq == Seq("monitor", "desk"))
  }

  test("$sort null placement: nulls first asc, last desc") {
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), "c")).toDF("x", "s")
    val asc = Pipeline.run(df, """[{"$sort":{"x":1}}]""").select("s").as[String].collect().toSeq
    assert(asc == Seq("b", "a", "c"))
    val desc = Pipeline.run(df, """[{"$sort":{"x":-1}}]""").select("s").as[String].collect().toSeq
    assert(desc == Seq("c", "a", "b"))
  }

  test("compound _id group key") {
    val out = Pipeline.run(sales,
      """[{"$group":{"_id":{"cat":"$category","reg":"$region"},"n":{"$sum":1}}},
        | {"$sort":{"_id":1}}]""".stripMargin)
    assert(out.count() == 4)
    assert(out.schema("_id").dataType.typeName == "struct")
  }

  test("runWithStats reports documentsProcessed/groupsCreated in one job") {
    val stats = Pipeline.runWithStats(sales,
      """[{"$group":{"_id":"$category","n":{"$sum":1}}}]""")()
    assert(stats.documentsProcessed == sales.count())
    assert(stats.groupsCreated ==
      sales.select("category").distinct().count())
    assert(stats.executionTimeMs >= 0)
  }
}
