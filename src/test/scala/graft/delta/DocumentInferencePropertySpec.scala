package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}

/**
 * Property check: DocumentInference's column types follow the reference's
 * rules (src/delta/table.ts:1289-1388) for randomly generated document
 * batches, verified against an independent driver-side reimplementation of
 * the type rules over the raw generated values. Generators are sampled with
 * fixed seeds (same driving style as MongoFilterPropertySpec).
 */
class DocumentInferencePropertySpec extends SparkTestBase {

  sealed trait V
  case object VNull extends V
  case class VInt(v: Long) extends V
  case class VDouble(v: Double) extends V
  case class VStr(v: String) extends V
  case class VBool(v: Boolean) extends V
  case class VArr(v: Seq[Long]) extends V

  private val genV: Gen[V] = Gen.frequency(
    2 -> Gen.const(VNull),
    4 -> Gen.chooseNum(-3000000000L, 3000000000L).map(VInt),
    2 -> Gen.chooseNum(-1e6, 1e6).map(VDouble),
    3 -> Gen.alphaNumStr.map(s => VStr(s.take(20))),
    2 -> Arbitrary.arbBool.arbitrary.map(VBool),
    1 -> Gen.listOfN(3, Gen.chooseNum(0L, 9L)).map(VArr))

  private val fieldNames = Vector("a", "b", "c", "d", "e")

  private val genDoc: Gen[Map[String, V]] = for {
    n <- Gen.chooseNum(0, fieldNames.size)
    fields <- Gen.pick(n, fieldNames)
    vals <- Gen.listOfN(n, genV)
  } yield fields.zip(vals).toMap

  private def json(doc: Map[String, V]): String =
    doc.map { case (k, v) =>
      val s = v match {
        case VNull => "null"
        case VInt(x) => x.toString
        case VDouble(x) => x.toString
        case VStr(x) => "\"" + x + "\""
        case VBool(x) => x.toString
        case VArr(x) => x.mkString("[", ",", "]")
      }
      "\"" + k + "\": " + s
    }.mkString("{", ", ", "}")

  /** The reference's per-field rule over ALL values (order-independent
    * variant documented in DocumentInference). */
  private def expectedType(vals: Seq[V]): Option[DataType] = {
    val nonNull = vals.filterNot(_ == VNull)
    if (nonNull.isEmpty) return Some(StringType) // all-null default
    if (nonNull.forall(_.isInstanceOf[VArr])) return Some(StringType) // variant
    if (nonNull.forall(_.isInstanceOf[VBool])) return Some(BooleanType)
    if (nonNull.forall(_.isInstanceOf[VStr])) return Some(StringType)
    val numeric = nonNull.forall(v => v.isInstanceOf[VInt] || v.isInstanceOf[VDouble])
    if (numeric) {
      val allIntInRange = nonNull.forall {
        case VInt(x) => x >= Int.MinValue.toLong && x <= Int.MaxValue.toLong
        case _ => false
      }
      Some(if (allIntInRange) IntegerType else DoubleType)
    } else None // mixed shapes: engine-defined, not asserted
  }

  test("inferred column types follow the reference rules on random documents") {
    val gen = Gen.listOfN(12, genDoc)
    val batches = (1 to 15).flatMap { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
    }.filter(_.exists(_.nonEmpty))
    assert(batches.size >= 10)
    batches.foreach { docs =>
      val ds = spark.createDataset(docs.map(json))(
        org.apache.spark.sql.Encoders.STRING)
      val df = DocumentInference.typedDocuments(spark, ds)
      // field-name union over all docs
      val present = docs.flatMap(_.keys).toSet
      assert(df.schema.fieldNames.toSet == present)
      present.foreach { f =>
        val vals = docs.flatMap(_.get(f))
        expectedType(vals).foreach { exp =>
          assert(df.schema(f).dataType == exp,
            s"field $f: expected $exp got ${df.schema(f).dataType} for $vals")
        }
      }
      // row count preserved, no doc dropped
      assert(df.count() == docs.size)
    }
  }
}
