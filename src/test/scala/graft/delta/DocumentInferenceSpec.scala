package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.types._
import java.nio.file.Files

class DocumentInferenceSpec extends SparkTestBase {
  import spark.implicits._

  test("reference inference rules: int32 range, double, variant, sparse union, null default") {
    val docs = Seq(
      """{"a": 1, "b": 2.5, "c": "x", "d": true, "e": {"k": 1}, "f": [1,2], "g": null}""",
      """{"a": 2, "big": 9999999999, "g": null}""")
    val df = DocumentInference.typedDocuments(spark, spark.createDataset(docs))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("a") == IntegerType)    // integral within ±2^31
    assert(types("big") == DoubleType)   // integral beyond ±2^31
    assert(types("b") == DoubleType)
    assert(types("c") == StringType)
    assert(types("d") == BooleanType)
    assert(types("e") == StringType)     // object → variant JSON string
    assert(types("f") == StringType)     // array → variant JSON string
    assert(types("g") == StringType)     // all-null → nullable string default
    val rows = df.orderBy("a").collect()
    assert(rows(0).getAs[String]("e") == """{"k":1}""")
    assert(rows(0).getAs[String]("f") == "[1,2]")
    // sparse: fields missing from a doc read back null
    assert(rows(0).isNullAt(rows(0).fieldIndex("big")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("c")))
    assert(rows(1).getAs[Double]("big") == 9999999999.0)
  }

  test("dotted field names are legal JSON keys, not nested paths") {
    val docs = Seq(
      """{"a.b": 1, "x.y.z": "v"}""",
      """{"a.b": 9999999999}""")
    val df = DocumentInference.typedDocuments(spark, spark.createDataset(docs))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("a.b") == DoubleType) // beyond ±2^31 in one doc
    assert(types("x.y.z") == StringType)
    assert(df.count() == 2)
  }

  test("writeDocuments: append evolves schema additively via merge") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-docs").toString)
    t.writeDocuments(Seq("""{"id": 1, "name": "a"}""", """{"id": 2, "name": "b"}"""))
    // second batch: new field + int→double widening on id
    t.writeDocuments(Seq("""{"id": 3.5, "name": "c", "extra": "z"}"""))
    val df = t.toDF()
    assert(df.schema("id").dataType == DoubleType)
    assert(df.schema("extra").dataType == StringType)
    assert(df.count() == 3)
    assert(df.filter("extra IS NULL").count() == 2) // backfilled nulls
  }

  test("malformed documents fail the write (no silent drop)") {
    val t = DeltaTable.forPath(spark, Files.createTempDirectory("graft-docs2").toString)
    intercept[Exception] {
      t.writeDocuments(Seq("""{"id": 1}""", """not json"""))
    }
  }
}
