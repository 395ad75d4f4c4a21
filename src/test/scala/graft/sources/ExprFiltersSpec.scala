package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.json4s.jackson.JsonMethods
import org.json4s.{JNothing, JValue}
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the Catalyst-expression → Mongo prune-filter translation:
  * translate ONLY what the file pruner can safely reason about; anything
  * ambiguous must yield no pruning (JNothing / dropped conjunct), because
  * an over-eager translation PRUNES FILES THAT HOLD MATCHING ROWS. */
class ExprFiltersSpec extends AnyFunSuite {

  private def j(v: JValue): String =
    if (v == JNothing) "{}" else JsonMethods.compact(JsonMethods.render(v))

  test("simple comparisons translate with the attribute on either side") {
    assert(j(ExprFilters.pruneJson(col("a") === 5)) ==
      """{"$and":[{"a":{"$eq":5}}]}""")
    assert(j(ExprFilters.pruneJson(lit(5) < col("a"))) ==
      """{"$and":[{"a":{"$gt":5}}]}""")
    assert(j(ExprFilters.pruneJson(col("s") === "x")) ==
      """{"$and":[{"s":{"$eq":"x"}}]}""")
  }

  test("AND conjunctions accumulate; untranslatable conjuncts drop out") {
    val v = ExprFilters.pruneJson(col("a") > 1 && col("b") === "x" && col("c").contains("q"))
    assert(j(v) == """{"$and":[{"a":{"$gt":1}},{"b":{"$eq":"x"}}]}""")
  }

  test("NOT / UDF shapes prune nothing") {
    assert(ExprFilters.pruneJson(!(col("a") === 1)) == JNothing)
  }

  test("null checks and string prefixes translate (round 14)") {
    assert(j(ExprFilters.pruneJson(col("a").isNull)) ==
      """{"$and":[{"a":{"$eq":null}}]}""")
    // <=> is null-safe equality = Mongo $eq
    assert(j(ExprFilters.pruneJson(col("a") <=> 5)) ==
      """{"$and":[{"a":{"$eq":5}}]}""")
    assert(j(ExprFilters.pruneJson(col("a") <=> lit(null))) ==
      """{"$and":[{"a":{"$eq":null}}]}""")
    assert(j(ExprFilters.pruneJson(col("a").isNotNull)) ==
      """{"$and":[{"a":{"$ne":null}}]}""")
    assert(j(ExprFilters.pruneJson(col("s").startsWith("ab"))) ==
      """{"$and":[{"s":{"$startsWith":"ab"}}]}""")
    // LIKE with a plain prefix pattern translates; real wildcards do not
    assert(j(ExprFilters.pruneJson(col("s").like("ab%"))) ==
      """{"$and":[{"s":{"$startsWith":"ab"}}]}""")
    assert(ExprFilters.pruneJson(col("s").like("ab%c")) == JNothing)
    assert(ExprFilters.pruneJson(col("s").like("a_b%")) == JNothing)
    assert(ExprFilters.pruneJson(col("s").like("%ab")) == JNothing)
    // rlike carries the raw pattern; the pruner anchors/voids it itself
    assert(j(ExprFilters.pruneJson(col("s").rlike("^ab.*"))) ==
      """{"$and":[{"s":{"$regex":"^ab.*"}}]}""")
  }

  test("OR translates branch-wise; an untranslatable branch voids the whole OR") {
    // round 14: `a = 1 OR b = 2` prunes disjunctively — a file survives if
    // EITHER branch might match it
    assert(j(ExprFilters.pruneJson(col("a") === 1 || col("b") === 2)) ==
      """{"$and":[{"$or":[{"$and":[{"a":{"$eq":1}}]},{"$and":[{"b":{"$eq":2}}]}]}]}""")
    // compound branches keep their conjunctions
    assert(j(ExprFilters.pruneJson((col("a") === 1 && col("c") > 5) || col("b") === 2)) ==
      """{"$and":[{"$or":[{"$and":[{"a":{"$eq":1}},{"c":{"$gt":5}}]},{"$and":[{"b":{"$eq":2}}]}]}]}""")
    // a branch that translates to nothing makes OR vacuous: no pruning
    // (true ∨ R is true — emitting just R would over-prune)
    assert(ExprFilters.pruneJson(col("a").contains("q") || col("b") === 2) == JNothing)
    assert(ExprFilters.pruneJson(col("a") === 1 || !(col("b") === 2)) == JNothing)
  }

  test("IN translates only when every element is a trusted literal") {
    assert(j(ExprFilters.pruneJson(col("a").isin(1, 2, 3))) ==
      """{"$and":[{"a":{"$in":[1,2,3]}}]}""")
    assert(ExprFilters.pruneJson(col("a").isin(lit(1), col("b"))) == JNothing)
  }

  test("date/timestamp literals translate to the canonical stat forms; decimals are refused") {
    // round-13: date/timestamp literals render in the SAME string forms
    // FooterStats writes (ISO date, micros-precision UTC timestamp), so
    // range filters on them zone-map- and partition-prune
    assert(j(ExprFilters.pruneJson(col("d") === java.sql.Date.valueOf("2024-01-01"))) ==
      """{"$and":[{"d":{"$eq":"2024-01-01"}}]}""")
    assert(j(ExprFilters.pruneJson(
      col("t") >= java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))) ==
      """{"$and":[{"t":{"$gte":"2024-01-01T00:00:00.000000"}}]}""")
    assert(ExprFilters.pruneJson(col("x") === BigDecimal("1.50")) == JNothing)
  }

  test("numeric widening casts unwrap; string and narrowing casts do not") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualTo, Literal}
    import org.apache.spark.sql.types.{IntegerType, StringType}
    // analyzer-style widening around a RESOLVED attribute: int vs long lit
    val ia = AttributeReference("a", IntegerType)()
    assert(j(ExprFilters.pruneJson(EqualTo(Cast(ia, LongType), Literal(5L)))) ==
      """{"$and":[{"a":{"$eq":5}}]}""")
    // CAST(string AS INT) = 5 changes match semantics (Spark trims
    // whitespace: ' 5' matches) — unwrapping would prune the ' 5' file
    val sa = AttributeReference("s", StringType)()
    assert(ExprFilters.pruneJson(EqualTo(Cast(sa, IntegerType), Literal(5))) == JNothing)
    // narrowing long→int is NOT value-preserving either
    val la = AttributeReference("l", LongType)()
    assert(ExprFilters.pruneJson(EqualTo(Cast(la, IntegerType), Literal(5))) == JNothing)
    // long→double loses precision above 2^53: `CAST(l AS DOUBLE) = 2^53`
    // is true for BOTH 2^53 and 2^53+1, but the unwrapped long comparison
    // against exact stats would skip the file holding only 2^53+1
    import org.apache.spark.sql.types.DoubleType
    assert(ExprFilters.pruneJson(
      EqualTo(Cast(la, DoubleType), Literal(9007199254740992.0))) == JNothing)
    // int→double IS exact (53-bit mantissa covers ints): still unwraps
    assert(j(ExprFilters.pruneJson(
      EqualTo(Cast(ia, DoubleType), Literal(5.0)))) ==
      """{"$and":[{"a":{"$eq":5.0}}]}""")
    // unresolved cast: conservatively no pruning
    assert(ExprFilters.pruneJson(col("a").cast(LongType) === 5L) == JNothing)
  }
}
