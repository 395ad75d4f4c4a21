package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.json4s.{JArray, JBool, JDouble, JLong, JNothing, JNull, JObject, JString, JValue}

/**
 * Conservative Catalyst `Expression` → Mongo-style prune-filter
 * translation, the SQL-DML twin of [[DeltaRelation.pruneJson]] (which does
 * the same over `sources.Filter`). ONLY used for file skipping
 * ([[graft.delta.FilePruner]] keeps files on anything it can't reason
 * about) — never for row filtering, so partial translation stays exact:
 * untranslatable conjuncts simply prune nothing.
 *
 * Handles top-level-attribute comparisons against foldable primitive and
 * date/timestamp literals, `AND` conjunctions, `OR` disjunctions (pruned
 * branch-wise), and `IN`/`InSet` lists. Decimals, nested fields, `NOT`:
 * skipped, matching the DSv1 translator's untrusted-stats policy.
 */
object ExprFilters {

  def pruneJson(condition: org.apache.spark.sql.Column): JValue =
    pruneJson(org.apache.spark.sql.graft.Shims.expression(condition))

  def pruneJson(e: Expression): JValue = {
    val conjuncts = conv(e)
    if (conjuncts.isEmpty) JNothing
    else JObject(List("$and" -> JArray(conjuncts.toList)))
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.name)
    // unwrap ONLY analyzer-inserted value-and-order-preserving numeric
    // widenings: a string⇄numeric cast changes match semantics (Spark
    // trims whitespace, etc.) and unwrapping it could prune a file that
    // holds matching rows
    case Cast(inner, dt, _, _)
        if inner.resolved && numericWidening(inner.dataType, dt) =>
      attrName(inner)
    case _ => None
  }

  private def numericWidening(from: org.apache.spark.sql.types.DataType,
                              to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val rank: Map[DataType, Int] = Map(ByteType -> 1, ShortType -> 2,
      IntegerType -> 3, LongType -> 4)
    // long→double is NOT value-preserving above 2^53: `longCol = <double
    // literal>` compared against exact long stats could skip a file whose
    // rows satisfy the cast predicate — only int-and-narrower may unwrap
    // into a double comparison
    (rank.contains(from) && (rank.get(to).exists(_ >= rank(from)) ||
      (to == DoubleType && rank(from) <= rank(IntegerType)))) ||
      (from == FloatType && to == DoubleType)
  }

  private def jraw(v: Any): Option[JValue] = v match {
    case null => None
    case i: Int => Some(JLong(i.toLong))
    case l: Long => Some(JLong(l))
    case s: Short => Some(JLong(s.toLong))
    case b: Byte => Some(JLong(b.toLong))
    case d: Double => Some(JDouble(d))
    case f: Float => Some(JDouble(f.toDouble))
    case s: org.apache.spark.unsafe.types.UTF8String => Some(JString(s.toString))
    case s: String => Some(JString(s))
    case b: Boolean => Some(JBool(b))
    case _ => None // dates/timestamps/decimals: pruner-untrusted forms
  }

  private def jlit(e: Expression): Option[JValue] = e match {
    case Literal(v, dt) =>
      // an Int literal under a LongType attribute compares fine (the
      // pruner compares numerically), but a DATE literal is also an Int —
      // gate on the literal's TYPE, not just its runtime class
      dt match {
        case _: org.apache.spark.sql.types.NumericType |
             org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BooleanType => jraw(v)
        // Catalyst date/timestamp literals (days / UTC micros / NTZ
        // micros) → the log's canonical string forms, the same rendering
        // FooterStats writes and FilePruner.compare parses — so date and
        // timestamp range filters zone-map-prune and partition-prune like
        // any other type instead of scanning every file.
        case org.apache.spark.sql.types.DateType => v match {
          case days: Int =>
            Some(JString(java.time.LocalDate.ofEpochDay(days.toLong).toString))
          case _ => None
        }
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => v match {
          case micros: Long =>
            Some(JString(java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              (Math.floorMod(micros, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
              .format(graft.delta.FilePruner.CanonFormat)))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  private def op(field: String, o: String, v: JValue): JObject =
    JObject(List(field -> JObject(List(o -> v))))

  private val flipped = Map("$gt" -> "$lt", "$gte" -> "$lte",
    "$lt" -> "$gt", "$lte" -> "$gte", "$eq" -> "$eq")

  private def cmp(l: Expression, r: Expression, o: String): Seq[JObject] =
    (attrName(l), jlit(r), attrName(r), jlit(l)) match {
      case (Some(f), Some(v), _, _) => Seq(op(f, o, v))
      case (_, _, Some(f), Some(v)) => Seq(op(f, flipped(o), v)) // 5 < x ⇒ x > 5
      case _ => Nil
    }

  // Disjunctions prune branch-wise; encoding + soundness rule live in
  // [[DeltaRelation.orJson]] (shared with the sources.Filter translator).
  private def disj(l: Expression, r: Expression): Seq[JObject] =
    DeltaRelation.orJson(conv(l), conv(r))

  /** `LIKE 'p%'` with a literal pattern that is a plain prefix (no other
    * wildcards, no escapes) → the prefix; anything else → None. */
  private def likePrefix(pattern: String): Option[String] =
    if (pattern.nonEmpty && pattern.last == '%' &&
        !pattern.init.exists(c => c == '%' || c == '_' || c == '\\'))
      Some(pattern.init)
    else None

  private def nullCheck(a: Expression, o: String): Seq[JObject] =
    attrName(a).map(f => op(f, o, JNull)).toSeq

  private def prefixCheck(l: Expression, r: Expression): Seq[JObject] =
    (attrName(l), r) match {
      case (Some(f), Literal(p: org.apache.spark.unsafe.types.UTF8String, _)) =>
        Seq(op(f, "$startsWith", JString(p.toString)))
      case _ => Nil
    }

  private def conv(e: Expression): Seq[JObject] = e match {
    case And(l, r) => conv(l) ++ conv(r)
    case Or(l, r) => disj(l, r)
    // `<=>` IS Mongo $eq (null-safe), incl. against a null literal
    case EqualNullSafe(l, Literal(null, _)) => nullCheck(l, "$eq")
    case EqualNullSafe(Literal(null, _), r) => nullCheck(r, "$eq")
    case EqualNullSafe(l, r) => cmp(l, r, "$eq")
    // Null checks and string prefixes prune like the DSv1 translator's
    // (IS [NOT] NULL / LIKE 'p%' — see DeltaRelation.pruneJson).
    case IsNull(a) => nullCheck(a, "$eq")
    case IsNotNull(a) => nullCheck(a, "$ne")
    case StartsWith(l, r) => prefixCheck(l, r)
    case Like(l, Literal(p: org.apache.spark.unsafe.types.UTF8String, _), '\\') =>
      likePrefix(p.toString) match {
        case Some(prefix) =>
          attrName(l).map(f => op(f, "$startsWith", JString(prefix))).toSeq
        case None => Nil
      }
    // RLIKE with a literal pattern: the pruner extracts a safe anchored
    // prefix itself (FilePruner.regexLiteralPrefix) or keeps everything.
    case RLike(l, Literal(p: org.apache.spark.unsafe.types.UTF8String, _)) =>
      attrName(l).map(f => op(f, "$regex", JString(p.toString))).toSeq
    case EqualTo(l, r) => cmp(l, r, "$eq")
    case GreaterThan(l, r) => cmp(l, r, "$gt")
    case GreaterThanOrEqual(l, r) => cmp(l, r, "$gte")
    case LessThan(l, r) => cmp(l, r, "$lt")
    case LessThanOrEqual(l, r) => cmp(l, r, "$lte")
    // A Column built from the public DSL (`col("a") === 5`) converts to
    // UNRESOLVED operator-function calls, not Catalyst comparison nodes —
    // the resolved forms above only appear on the SQL-DML path (where the
    // analyzer ran first). Same conservative rules, pre-resolution shape.
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if u.nameParts.length == 1 && !u.isDistinct =>
      (u.nameParts.head.toLowerCase(java.util.Locale.ROOT), u.arguments) match {
        case ("and", Seq(l, r)) => conv(l) ++ conv(r)
        case ("or", Seq(l, r)) => disj(l, r)
        case ("isnull", Seq(a)) => nullCheck(a, "$eq")
        case ("isnotnull", Seq(a)) => nullCheck(a, "$ne")
        case ("startswith", Seq(l, r)) => prefixCheck(l, r)
        case ("rlike" | "regexp" | "regexp_like",
              Seq(l, Literal(p: org.apache.spark.unsafe.types.UTF8String, _))) =>
          attrName(l).map(f => op(f, "$regex", JString(p.toString))).toSeq
        case ("like", Seq(l, Literal(p: org.apache.spark.unsafe.types.UTF8String, _))) =>
          likePrefix(p.toString) match {
            case Some(prefix) =>
              attrName(l).map(f => op(f, "$startsWith", JString(prefix))).toSeq
            case None => Nil
          }
        case ("=" | "==", Seq(l, r)) => cmp(l, r, "$eq")
        case ("<=>", Seq(l, Literal(null, _))) => nullCheck(l, "$eq")
        case ("<=>", Seq(Literal(null, _), r)) => nullCheck(r, "$eq")
        case ("<=>", Seq(l, r)) => cmp(l, r, "$eq")
        case (">", Seq(l, r)) => cmp(l, r, "$gt")
        case (">=", Seq(l, r)) => cmp(l, r, "$gte")
        case ("<", Seq(l, r)) => cmp(l, r, "$lt")
        case ("<=", Seq(l, r)) => cmp(l, r, "$lte")
        case ("in", a +: vs) if vs.nonEmpty =>
          val lits = vs.map(jlit)
          attrName(a) match {
            case Some(f) if lits.forall(_.isDefined) =>
              Seq(JObject(List(f -> JObject(List("$in" -> JArray(lits.flatten.toList))))))
            case _ => Nil
          }
        case _ => Nil
      }
    case In(a, vs) =>
      val lits = vs.map(jlit)
      attrName(a) match {
        case Some(f) if lits.nonEmpty && lits.forall(_.isDefined) =>
          Seq(JObject(List(f -> JObject(List("$in" -> JArray(lits.flatten.toList))))))
        case _ => Nil
      }
    case InSet(a, vs) // optimizer's large-IN form; values are raw.
        // Same date-vs-int ambiguity as jlit: only trust the set when the
        // ATTRIBUTE type says the raw values mean what they look like.
        if a.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
           a.dataType == org.apache.spark.sql.types.StringType ||
           a.dataType == org.apache.spark.sql.types.BooleanType =>
      attrName(a) match {
        case Some(f) =>
          val lits = vs.toSeq.map(jraw)
          if (lits.nonEmpty && lits.forall(_.isDefined))
            Seq(JObject(List(f -> JObject(List("$in" -> JArray(lits.flatten.toList))))))
          else Nil
        case None => Nil
      }
    case _ => Nil // Not/null-checks/UDFs: no file skipping, still exact
  }
}
