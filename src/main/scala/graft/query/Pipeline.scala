package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * MongoDB-style aggregation pipeline → DataFrame transforms.
 *
 * The stage list is our "parser"; Catalyst is the analyzer/optimizer — each
 * stage maps 1:1 onto a logical-plan node (reference executor:
 * aggregate(docs, pipeline), src/query/index.ts:1722-1770; stage semantics
 * at the line ranges cited per stage below). Shuffles appear exactly where
 * the reference had its in-memory hash map and sort ($group/$sort).
 *
 * Semantics notes honored:
 *  - `$group._id`: null ⇒ single group; `"$field"` path; compound object
 *    (src/query/index.ts:1429-1494). The key lands in an `_id` output column.
 *  - `$sum`: non-numeric fields are skipped and an empty sum is 0, not null
 *    (src/query/index.ts:1222-1253); a constant operand sums to count·c.
 *  - `$push` keeps nulls (src/query/index.ts:1356-1365) — implemented by
 *    collecting struct-wrapped values, since collect_list drops bare nulls.
 *  - `$addToSet` distinct values (src/query/index.ts:1372-1387); set order is
 *    normalized to sorted (the reference's insertion order is inherently
 *    sequential — a distributed engine must pick a deterministic order).
 *  - `$sort`: 1/-1 keys; nulls first on asc, last on desc
 *    (src/query/index.ts:1501-1542) — Spark's default null placement.
 *  - `$unwind` explodes array fields; `preserveNullAndEmptyArrays` keeps the
 *    parent row with null (src/query/index.ts:1549-1583).
 */
object Pipeline {

  def run(df: DataFrame, pipelineJson: String): DataFrame =
    JsonMethods.parse(pipelineJson) match {
      case JArray(stages) => stages.foldLeft(df)(applyStage)
      case other => throw new IllegalArgumentException(s"pipeline must be an array: $other")
    }

  /** Execution stats, mirroring the reference's aggregate() stats block
    * (src/query/index.ts:1137-1149): input docs processed, groups created
    * (summed over `$group` stages), wall time of the driving action. */
  final case class PipelineStats(documentsProcessed: Long, groupsCreated: Long,
                                 executionTimeMs: Long)

  /**
   * Run the pipeline and collect execution stats. Counters ride the SAME
   * distributed job via `Dataset.observe` (Spark's observed-metrics channel)
   * — observability costs zero extra scans, where the reference incremented
   * driver-side counters per row. `action` drives execution (default: a
   * foreach-noop full pass).
   */
  def runWithStats(df: DataFrame, pipelineJson: String)
                  (action: DataFrame => Unit = _.foreach(_ => ())): (PipelineStats) = {
    import org.apache.spark.sql.Observation
    val stages = JsonMethods.parse(pipelineJson) match {
      case JArray(ss) => ss
      case other => throw new IllegalArgumentException(s"pipeline must be an array: $other")
    }
    val inObs = Observation()
    var cur = df.observe(inObs, count(lit(1)).as("n"))
    val groupObs = Seq.newBuilder[Observation]
    stages.foreach { st =>
      cur = applyStage(cur, st)
      st match {
        case JObject(List(("$group", _))) =>
          val o = Observation()
          cur = cur.observe(o, count(lit(1)).as("n"))
          groupObs += o
        case _ => ()
      }
    }
    val t0 = System.nanoTime()
    action(cur)
    val ms = (System.nanoTime() - t0) / 1000000L
    def n(o: Observation): Long = o.get("n").asInstanceOf[Long]
    PipelineStats(n(inObs), groupObs.result().map(n).sum, ms)
  }

  private def applyStage(df: DataFrame, stage: JValue): DataFrame = stage match {
    case JObject(List((op, body))) => op match {
      case "$match" => df.filter(MongoFilter.translate(body, df.schema))
      case "$group" => group(df, body)
      case "$project" => Projection.project(df, body)
      case "$sort" => sort(df, body)
      case "$limit" => df.limit(intOf(body))
      case "$skip" => df.offset(intOf(body))
      case "$unwind" => unwind(df, body)
      case "$count" => df.agg(count(lit(1)).as(body match {
        case JString(s) => s; case _ => "count"
      }))
      case other => throw new IllegalArgumentException(s"unsupported stage $other")
    }
    case other => throw new IllegalArgumentException(s"each stage must be a single-key object: $other")
  }

  private def intOf(j: JValue): Int = j match {
    case JInt(n) => n.toInt
    case JLong(n) => n.toInt
    case JDouble(d) => d.toInt
    case other => throw new IllegalArgumentException(s"expected integer: $other")
  }

  /** `"$path"` → column reference. */
  private def fieldRef(j: JValue): Option[Column] = j match {
    case JString(s) if s.startsWith("$") => Some(col(s.drop(1)))
    case _ => None
  }

  // ---- $group --------------------------------------------------------------

  private def group(df: DataFrame, body: JValue): DataFrame = {
    val spec = body match {
      case JObject(fs) => fs
      case other => throw new IllegalArgumentException(s"$$group needs an object: $other")
    }
    val idSpec = spec.find(_._1 == "_id").map(_._2).getOrElse(JNull)
    val accs = spec.filterNot(_._1 == "_id")

    val keyCol: Column = idSpec match {
      case JNull => lit(null)
      case JString(s) if s.startsWith("$") => col(s.drop(1))
      case JObject(fields) =>
        struct(fields.map { case (name, v) =>
          fieldRef(v).getOrElse(jlit(v)).as(name)
        }: _*)
      case other => jlit(other)
    }

    val aggCols = accs.map { case (outName, accSpec) =>
      accumulator(accSpec).as(outName)
    }
    if (aggCols.isEmpty)
      df.groupBy(keyCol.as("_id")).agg(count(lit(1)).as("__n")).drop("__n")
    else
      df.groupBy(keyCol.as("_id")).agg(aggCols.head, aggCols.tail: _*)
  }

  private def accumulator(spec: JValue): Column = spec match {
    case JObject(List((op, operand))) => op match {
      case "$sum" => operand match {
        case f if fieldRef(f).isDefined =>
          coalesce(sum(fieldRef(f).get), lit(0)) // empty/non-numeric ⇒ 0
        case n => count(lit(1)) * jlit(n) // constant: count·c ($sum:1 ⇒ count)
      }
      case "$avg" => avg(fieldRef(operand).getOrElse(jlit(operand)))
      case "$min" => min(fieldRef(operand).getOrElse(jlit(operand)))
      case "$max" => max(fieldRef(operand).getOrElse(jlit(operand)))
      case "$first" => first(fieldRef(operand).getOrElse(jlit(operand)))
      case "$last" => last(fieldRef(operand).getOrElse(jlit(operand)))
      case "$push" =>
        // Null-keeping collect: wrap in struct, then unwrap.
        val c = fieldRef(operand).getOrElse(jlit(operand))
        transform(collect_list(struct(c.as("v"))), x => x.getField("v"))
      case "$addToSet" =>
        array_sort(collect_set(fieldRef(operand).getOrElse(jlit(operand))))
      case "$count" => count(lit(1))
      case "$stdDevPop" => stddev_pop(fieldRef(operand).getOrElse(jlit(operand)))
      case "$stdDevSamp" => stddev_samp(fieldRef(operand).getOrElse(jlit(operand)))
      case other => throw new IllegalArgumentException(s"unsupported accumulator $other")
    }
    case JObject(_) => throw new IllegalArgumentException(
      "accumulator must have exactly one $-operator")
    case other => throw new IllegalArgumentException(s"invalid accumulator: $other")
  }

  private def jlit(v: JValue): Column = v match {
    case JString(s) => lit(s)
    case JInt(n) => lit(n.toLong)
    case JLong(n) => lit(n)
    case JDouble(d) => lit(d)
    case JDecimal(d) => lit(d.toDouble)
    case JBool(b) => lit(b)
    case JNull => lit(null)
    case other => lit(JsonMethods.compact(JsonMethods.render(other)))
  }

  // ---- $sort ---------------------------------------------------------------

  private def sort(df: DataFrame, body: JValue): DataFrame = body match {
    case JObject(keys) if keys.nonEmpty =>
      val orders = keys.map {
        case (f, JInt(n)) if n < 0 => col(f).desc_nulls_last
        case (f, JDouble(d)) if d < 0 => col(f).desc_nulls_last
        case (f, _) => col(f).asc_nulls_first
      }
      df.orderBy(orders: _*)
    case other => throw new IllegalArgumentException(s"$$sort needs an object: $other")
  }

  // ---- $unwind -------------------------------------------------------------

  private def unwind(df: DataFrame, body: JValue): DataFrame = {
    val (path, preserve) = body match {
      case JString(s) => (s.stripPrefix("$"), false)
      case JObject(fs) =>
        val p = fs.collectFirst { case ("path", JString(s)) => s.stripPrefix("$") }
          .getOrElse(throw new IllegalArgumentException("$unwind needs path"))
        val keep = fs.collectFirst { case ("preserveNullAndEmptyArrays", JBool(b)) => b }
          .getOrElse(false)
        (p, keep)
      case other => throw new IllegalArgumentException(s"invalid $$unwind: $other")
    }
    val exploded = if (preserve) explode_outer(col(path)) else explode(col(path))
    // Replace the array column in place, preserving the others.
    val cols = df.schema.fieldNames.map { f =>
      if (f == path) exploded.as(path) else col(f)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
