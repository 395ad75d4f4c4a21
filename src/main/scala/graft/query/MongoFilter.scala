package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * MongoDB-style filter document → Catalyst `Column` translator.
 *
 * Reproduces the filter semantics of the reference engine's query layer
 * (reference: src/query/index.ts:255-494) as a declarative Spark `Column`
 * expression, so Catalyst can push comparisons down to the Parquet scan.
 *
 * Semantic notes honored (reference file:line cited per operator):
 *  - `$eq` / implicit equality is strict JS `===` (src/query/index.ts:383-384):
 *    `null == null` matches → translated to null-safe `<=>`.
 *  - `$ne` is strict `!==` (src/query/index.ts:387-389): matches when the field
 *    is null → `!(col <=> lit)`.
 *  - `$gt/$gte/$lt/$lte` compare only mutually-comparable types; null/missing
 *    and cross-type comparisons never match (src/query/index.ts:391-405,443-455).
 *  - `$in`/`$nin` use strict per-element equality (src/query/index.ts:407-413):
 *    membership is the null-safe OR over elements, so a null field matches
 *    `$in: [.., null]` and matches `$nin` whenever null is not in the list.
 *  - `$exists` (src/query/index.ts:415-417): with a fixed relational schema a
 *    declared column is always "present"; for nested paths the field exists iff
 *    every intermediate struct is non-null.
 *  - `$regex` applies to strings only (src/query/index.ts:420-421,474-494).
 *  - `$type` is accepted but never evaluated by the reference — we mirror that
 *    (declared at src/query/index.ts:24,127; no evaluation case exists).
 *  - Filter documents are conjunctive across entries (src/query/index.ts:255-297).
 */
object MongoFilter {

  /** Operator whitelist enforced at query entry (reference validates before
    * evaluating, src/delta/table.ts:1847-1893; eval itself skips unknowns). */
  private val KnownOperators = Set(
    "$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin",
    "$exists", "$regex", "$options", "$type", "$and", "$or", "$not", "$nor")

  final class FilterValidationException(op: String)
    extends IllegalArgumentException(s"unknown filter operator: $op")

  /** Throw on operators outside the whitelist (recursively). */
  def validate(filter: JValue): Unit = filter match {
    case JObject(fields) => fields.foreach { case (k, v) =>
      if (k.startsWith("$") && !KnownOperators.contains(k))
        throw new FilterValidationException(k)
      validate(v)
    }
    case JArray(items) => items.foreach(validate)
    case _ => ()
  }

  /** Parse a JSON filter document and translate against `schema`. */
  def column(filterJson: String, schema: StructType): Column =
    translate(JsonMethods.parse(filterJson), schema)

  /** Translate an already-parsed filter document. */
  def translate(filter: JValue, schema: StructType): Column = filter match {
    case JObject(fields) =>
      if (fields.isEmpty) lit(true)
      else fields.map { case (k, v) => entry(k, v, schema) }.reduce(_ && _)
    case JNothing | JNull => lit(true)
    case other =>
      throw new IllegalArgumentException(s"filter must be an object, got $other")
  }

  private def entry(key: String, v: JValue, schema: StructType): Column = key match {
    case "$and" => subFilters(v, schema).reduce(_ && _)
    case "$or"  => subFilters(v, schema).reduce(_ || _)
    // Negation must be two-valued: an ordered compare / regex on a null field
    // is SQL-NULL (which correctly "never matches" at the top level), but the
    // reference's row semantics make `$not` of a non-match TRUE — so coalesce
    // NULL→false before negating (src/query/index.ts:271-277).
    case "$nor" => !coalesce(subFilters(v, schema).reduce(_ || _), lit(false))
    case "$not" => !coalesce(translate(v, schema), lit(false))
    case k if k.startsWith("$") =>
      // Unknown top-level $-operators are skipped by the reference
      // (src/query/index.ts:280-284): treat as match-all.
      lit(true)
    case path => v match {
      case JObject(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
        ops.map { case (op, operand) => comparison(path, op, operand, ops.toMap, schema) }
          .reduce(_ && _)
      case other => nullSafeEq(path, other, schema)
    }
  }

  private def subFilters(v: JValue, schema: StructType): Seq[Column] = v match {
    case JArray(items) if items.nonEmpty => items.map(translate(_, schema))
    case _ => Seq(lit(true))
  }

  private def comparison(path: String, op: String, v: JValue,
                         siblings: Map[String, JValue], schema: StructType): Column = {
    val f = col(path)
    op match {
      case "$eq" => nullSafeEq(path, v, schema)
      case "$ne" => !nullSafeEq(path, v, schema)
      case "$gt"  => ordered(path, v, schema)(_ > _)
      case "$gte" => ordered(path, v, schema)(_ >= _)
      case "$lt"  => ordered(path, v, schema)(_ < _)
      case "$lte" => ordered(path, v, schema)(_ <= _)
      case "$in"  => membership(path, v, schema)
      case "$nin" => !membership(path, v, schema)
      case "$exists" =>
        val want = v match { case JBool(b) => b; case _ => true }
        val ex = exists(path, schema)
        if (want) ex else !ex
      case "$regex" =>
        if (isString(path, schema)) {
          val pattern = v match { case JString(s) => s; case other => other.toString }
          // ReDoS caps (src/query/index.ts:43-46,474-494): patterns over
          // 1000 chars are rejected; input strings over 10000 chars NEVER
          // match (the reference returns false rather than running the regex).
          if (pattern.length > 1000)
            throw new IllegalArgumentException(
              s"regex pattern too long (${pattern.length} > 1000)")
          val opts = siblings.get("$options").collect { case JString(s) => s }.getOrElse("")
          val p = if (opts.contains("i")) "(?i)" + pattern else pattern
          length(f) <= 10000 && f.rlike(p)
        } else lit(false) // non-strings never match (src/query/index.ts:474-477)
      case "$options" => lit(true) // consumed alongside $regex
      case "$type" => lit(true)    // accepted-but-ignored, per reference
      case _ => lit(true)          // unknown $-operators skipped
    }
  }

  /** Strict-equality (`===`) semantics: null-safe equality; cross-type → false. */
  private def nullSafeEq(path: String, v: JValue, schema: StructType): Column =
    literalFor(path, v, schema) match {
      case Some(l) => col(path) <=> l
      case None    => if (v == JNull) col(path).isNull else lit(false)
    }

  /** Ordered comparison: comparable types only, null never matches. */
  private def ordered(path: String, v: JValue, schema: StructType)
                     (cmp: (Column, Column) => Column): Column =
    literalFor(path, v, schema) match {
      case Some(l) => cmp(col(path), l) // SQL three-valued logic drops nulls, as required
      case None    => lit(false)
    }

  /** Null-safe membership over the elements of a `$in`/`$nin` array. */
  private def membership(path: String, v: JValue, schema: StructType): Column = v match {
    case JArray(items) if items.nonEmpty =>
      items.map(nullSafeEq(path, _, schema)).reduce(_ || _)
    case _ => lit(false)
  }

  private def exists(path: String, schema: StructType): Column = {
    val parts = path.split('.')
    resolveType(schema, parts) match {
      case None => lit(false)
      case Some(_) =>
        // Field is declared; nested paths additionally require non-null parents
        // (missing intermediate → undefined, src/query/index.ts:312-328).
        if (parts.length == 1) lit(true)
        else col(parts.dropRight(1).mkString(".")).isNotNull
    }
  }

  private def isString(path: String, schema: StructType): Boolean =
    resolveType(schema, path.split('.')).contains(StringType)

  /** Resolve a dotted path through nested StructTypes. */
  private[query] def resolveType(schema: StructType, parts: Seq[String]): Option[DataType] =
    parts.foldLeft(Option(schema: DataType)) {
      case (Some(st: StructType), name) => st.fields.find(_.name == name).map(_.dataType)
      case _ => None
    }

  /**
   * Build a typed literal for comparing against column `path`, or None when the
   * JS strict-comparison would be a guaranteed non-match (cross-type).
   * Typed literals keep the predicate pushdown-eligible (no cast on the column).
   */
  private def literalFor(path: String, v: JValue, schema: StructType): Option[Column] = {
    val colType = resolveType(schema, path.split('.'))
    v match {
      case JNull => None // handled by callers (eq → isNull; ordered → false)
      case JString(s) => colType match {
        case Some(StringType) => Some(lit(s))
        case Some(TimestampType) => Some(lit(parseTimestamp(s)))
        case Some(TimestampNTZType) =>
          // NTZ literal (LocalDateTime) keeps the comparison cast-free on the
          // column, so it stays pushdown-eligible at the parquet scan.
          Some(lit(parseLocalDateTime(s)))
        case Some(DateType) => Some(lit(java.sql.Date.valueOf(s)))
        case _ => None // string vs non-string: strict compare never matches
      }
      case JInt(n) => numericLiteral(colType, n.toDouble, integral = true, n)
      case JLong(n) => numericLiteral(colType, n.toDouble, integral = true, BigInt(n))
      case JDouble(d) => numericLiteral(colType, d, integral = d.isWhole, BigInt(d.toLong))
      case JDecimal(d) => numericLiteral(colType, d.toDouble, integral = d.isWhole,
        if (d.isWhole) d.toBigInt else BigInt(0))
      case JBool(b) => colType match {
        case Some(BooleanType) => Some(lit(b))
        case _ => None
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported literal in filter: $other")
    }
  }

  /** JS numbers are one type; map onto the column's numeric type when exact. */
  private def numericLiteral(colType: Option[DataType], d: Double,
                             integral: Boolean, i: BigInt): Option[Column] = colType match {
    case Some(DoubleType) => Some(lit(d))
    case Some(FloatType)  => Some(lit(d).cast(DoubleType)) // compare widened, stays correct
    case Some(IntegerType) =>
      if (integral && i.isValidInt) Some(lit(i.toInt))
      else Some(lit(d)) // fractional vs int column: natural promotion keeps semantics
    case Some(LongType) =>
      if (integral && i.isValidLong) Some(lit(i.toLong))
      else Some(lit(d))
    case Some(ShortType) if integral && i.isValidShort => Some(lit(i.toShort))
    case Some(_: DecimalType) => Some(lit(BigDecimal(d)))
    case _ => None // numeric vs non-numeric: never matches
  }

  private def parseLocalDateTime(s: String): java.time.LocalDateTime =
    try java.time.LocalDateTime.ofInstant(java.time.Instant.parse(s), java.time.ZoneOffset.UTC)
    catch {
      case _: java.time.format.DateTimeParseException =>
        if (s.contains("T") || s.contains(" ")) java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        else java.time.LocalDate.parse(s).atStartOfDay()
    }

  private def parseTimestamp(s: String): java.sql.Timestamp = {
    val inst =
      try java.time.Instant.parse(s)
      catch {
        case _: java.time.format.DateTimeParseException =>
          val ldt =
            if (s.contains("T") || s.contains(" "))
              java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            else java.time.LocalDate.parse(s).atStartOfDay()
          ldt.toInstant(java.time.ZoneOffset.UTC)
      }
    java.sql.Timestamp.from(inst)
  }
}
