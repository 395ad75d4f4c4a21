package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class VariantSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1, """{"k": 10, "tag": "a", "nested": {"x": 1.5}}"""),
    (2, """{"k": -3, "tag": "b"}"""),
    (3, null),
    (4, """{"tag": "c", "extra": true}""")).toDF("id", "props")

  test("inferSchema discovers the union of fields across rows") {
    val s = Variant.inferSchema(docs, "props")
    assert(s.fieldNames.toSet == Set("k", "tag", "nested", "extra"))
    assert(s("k").dataType == LongType)
    assert(s("tag").dataType == StringType)
    assert(s("nested").dataType.isInstanceOf[StructType])
  }

  test("shred materializes typed columns; missing/null JSON yields null") {
    val out = Variant.shred(docs, "props", Seq("k" -> IntegerType, "tag" -> StringType))
      .orderBy($"id")
    assert(out.columns.toSeq == Seq("id", "props", "props_k", "props_tag"))
    val rows = out.select($"id", $"props_k", $"props_tag").as[(Int, Option[Int], Option[String])].collect()
    assert(rows.toSeq == Seq(
      (1, Some(10), Some("a")), (2, Some(-3), Some("b")),
      (3, None, None), (4, None, Some("c"))))
  }

  test("shredAll shreds every discovered top-level field") {
    val out = Variant.shredAll(docs.select($"id", $"props"), "props")
    assert(Set("props_k", "props_tag", "props_extra", "props_nested")
      .subsetOf(out.columns.toSet))
    assert(out.filter($"id" === 4).select($"props_extra").head().getBoolean(0))
  }
}
