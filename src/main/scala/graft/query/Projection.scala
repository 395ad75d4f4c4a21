package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * MongoDB-style projection → DataFrame select/drop.
 *
 * Mirrors the reference's projection semantics (src/query/index.ts:728-884):
 *  - array form `["a","b"]` or object form `{a:1}` / `{a:0}`;
 *  - include vs exclude mode is decided by the FIRST entry
 *    (src/query/index.ts:741-743); there is no `_id` exception;
 *  - missing fields are silently dropped (include of an unknown field is a
 *    no-op, src/query/index.ts:99-101);
 *  - nested dot-paths rebuild / prune nested structure
 *    (src/query/index.ts:765-814, 829-884).
 */
object Projection {

  def apply(df: DataFrame, projectionJson: String): DataFrame =
    project(df, JsonMethods.parse(projectionJson))

  def project(df: DataFrame, proj: JValue): DataFrame = proj match {
    case JArray(items) =>
      include(df, items.collect { case JString(s) => s })
    case JObject(fields) if fields.nonEmpty =>
      val isInclude = fields.head._2 match {
        case JInt(n)  => n != 0
        case JBool(b) => b
        case JDouble(d) => d != 0.0
        case _ => true
      }
      val paths = fields.map(_._1)
      if (isInclude) include(df, paths) else exclude(df, paths)
    case _ => df
  }

  /** Include-mode: keep only the listed (possibly dotted) paths. */
  private def include(df: DataFrame, paths: Seq[String]): DataFrame = {
    val schema = df.schema
    // Silently drop unknown paths, as the reference does.
    val known = paths.filter(p => MongoFilter.resolveType(schema, p.split('.')).isDefined)
    if (known.isEmpty) return df.select()
    // Group by top-level field; a bare top-level mention keeps the whole subtree.
    val byTop: Seq[(String, Seq[String])] =
      known.map { p => val parts = p.split('.'); (parts.head, parts.tail.mkString(".")) }
        .groupBy(_._1).view.mapValues(_.map(_._2).filter(_.nonEmpty)).toSeq
        .sortBy { case (top, _) => schema.fieldIndex(top) }
    val cols: Seq[Column] = byTop.map {
      case (top, subs) if subs.isEmpty => col(top)
      case (top, subs) => rebuildStruct(top, subs).as(top)
    }
    df.select(cols: _*)
  }

  /** Rebuild a struct column keeping only the requested sub-paths. */
  private def rebuildStruct(top: String, subPaths: Seq[String]): Column = {
    val grouped = subPaths.map { p => val parts = p.split('.'); (parts.head, parts.tail.mkString(".")) }
      .groupBy(_._1).view.mapValues(_.map(_._2).filter(_.nonEmpty)).toSeq
    val fields = grouped.map {
      case (name, rest) if rest.isEmpty => col(s"$top.$name").as(name)
      case (name, rest) => rebuildStruct(s"$top.$name", rest).as(name)
    }
    struct(fields: _*)
  }

  /** Exclude-mode: drop the listed paths; nested paths use dropFields. */
  private def exclude(df: DataFrame, paths: Seq[String]): DataFrame = {
    val (topLevel, nested) = paths.partition(!_.contains('.'))
    val afterTop = if (topLevel.nonEmpty) df.drop(topLevel: _*) else df
    nested.foldLeft(afterTop) { (acc, path) =>
      val parts = path.split('.')
      val top = parts.head
      if (MongoFilter.resolveType(acc.schema, parts).isEmpty) acc
      else acc.withColumn(top, col(top).dropFields(parts.tail.mkString(".")))
    }
  }
}
