package graft.query

import graft.SparkTestBase
import org.json4s._
import org.json4s.JsonDSL._
import org.scalacheck.Gen

/**
 * Property test: the Column translation agrees with a direct Scala
 * re-implementation of the reference's row-at-a-time `matchesFilter`
 * semantics (strict equality, null behavior, comparable-only ranges) on
 * random data and random filter documents.
 */
case class PropDoc(id: Int, s: Option[String], n: Option[Int])

class MongoFilterPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val genDoc = for {
    id <- Gen.choose(0, 1000000)
    s <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
    n <- Gen.option(Gen.choose(-5, 5))
  } yield PropDoc(id, s, n)

  // Random simple filter docs over fields s (string) and n (int).
  private val genLeaf: Gen[JObject] = for {
    field <- Gen.oneOf("s", "n")
    op <- Gen.oneOf("$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin")
    jv <- if (field == "s")
      Gen.oneOf[JValue](JString("a"), JString("b"), JString("zz"), JNull)
    else Gen.oneOf[JValue](JInt(0), JInt(3), JInt(-2), JNull)
  } yield {
    val operand: JValue =
      if (op == "$in" || op == "$nin") JArray(List(jv, if (field == "s") JString("c") else JInt(1)))
      else jv
    JObject(field -> JObject(op -> operand))
  }

  private val genFilter: Gen[JObject] = Gen.oneOf(
    genLeaf,
    for { a <- genLeaf; b <- genLeaf } yield JObject("$and" -> JArray(List(a, b))),
    for { a <- genLeaf; b <- genLeaf } yield JObject("$or" -> JArray(List(a, b))),
    for { a <- genLeaf } yield JObject("$not" -> a))

  /** Reference semantics re-implemented row-at-a-time. */
  private def matches(doc: PropDoc, filter: JValue): Boolean = filter match {
    case JObject(entries) => entries.forall {
      case ("$and", JArray(fs)) => fs.forall(matches(doc, _))
      case ("$or", JArray(fs)) => fs.exists(matches(doc, _))
      case ("$not", f) => !matches(doc, f)
      case (field, JObject(ops)) => ops.forall { case (op, v) => cmp(doc, field, op, v) }
      case (field, literal) => cmp(doc, field, "$eq", literal)
    }
    case _ => true
  }

  private def fieldVal(doc: PropDoc, field: String): Option[Any] = field match {
    case "s" => doc.s
    case "n" => doc.n
  }

  private def strictEq(value: Option[Any], v: JValue): Boolean = (value, v) match {
    case (None, JNull) => true
    case (Some(x: String), JString(y)) => x == y
    case (Some(x: Int), JInt(y)) => BigInt(x) == y
    case _ => false
  }

  private def cmp(doc: PropDoc, field: String, op: String, v: JValue): Boolean = {
    val value = fieldVal(doc, field)
    op match {
      case "$eq" => strictEq(value, v)
      case "$ne" => !strictEq(value, v)
      case "$in" => v match {
        case JArray(items) => items.exists(strictEq(value, _))
        case _ => false
      }
      case "$nin" => v match {
        case JArray(items) => !items.exists(strictEq(value, _))
        case _ => true
      }
      case ord => (value, v) match {
        // ordered compares: comparable types only, null never matches
        case (Some(x: Int), JInt(y)) =>
          val c = BigInt(x).compare(y)
          ord match {
            case "$gt" => c > 0; case "$gte" => c >= 0
            case "$lt" => c < 0; case "$lte" => c <= 0
          }
        case (Some(x: String), JString(y)) =>
          val c = x.compareTo(y)
          ord match {
            case "$gt" => c > 0; case "$gte" => c >= 0
            case "$lt" => c < 0; case "$lte" => c <= 0
          }
        case _ => false
      }
    }
  }

  test("Column translation agrees with reference row semantics on random data") {
    val rnd = new scala.util.Random(42)
    val docs = Gen.listOfN(80, genDoc)(Gen.Parameters.default, org.scalacheck.rng.Seed(1L)).get
    val df = docs.toDF("id", "s", "n").cache()
    val schema = df.schema
    (0 until 60).foreach { i =>
      val filter = genFilter(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .getOrElse(JObject())
      val expected = docs.filter(matches(_, filter)).map(_.id).toSet
      val got = df.filter(MongoFilter.translate(filter, schema))
        .select("id").as[Int].collect().toSet
      assert(got == expected, s"filter=${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(filter))}")
    }
  }
}
