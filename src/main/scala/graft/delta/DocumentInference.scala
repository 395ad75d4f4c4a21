package graft.delta

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Document-shaped ingestion: untyped JSON rows → typed DataFrame under the
 * reference's inference rules (reference: inferSchemaFromRows / inferType,
 * src/delta/table.ts:1289-1388):
 *
 *  - field names are the UNION over all rows (sparse docs supported);
 *  - integral numbers within ±2^31 → int32, any other number → double;
 *  - strings → string, booleans → boolean;
 *  - arrays/objects → variant, stored as a JSON string;
 *  - all-null fields → nullable string (the reference default).
 *
 * Where the reference takes the FIRST non-null value's type per field (an
 * order-dependent rule a distributed engine cannot honor deterministically),
 * this implementation takes the numeric join over ALL values — int32 unless
 * any value requires double — which agrees with the reference on every
 * type-consistent corpus and is deterministic under any row order.
 *
 * The field-name scan and type detection run DISTRIBUTED via Spark's own
 * two-pass JSON inference; the only driver-side step is one min/max
 * aggregation row for the int32-range decision.
 */
object DocumentInference {

  /** Column reference by EXACT name (backtick-quoted, `` ` `` escaped by
    * doubling) — never interpreted as a nested-field path. */
  private def quoted(name: String) =
    col(s"`${name.replace("`", "``")}`")

  /** Parse JSON document rows into a typed DataFrame per the rules above.
    * Malformed documents fail the job (the reference's ValidationError). */
  def typedDocuments(spark: SparkSession, docs: Dataset[String]): DataFrame = {
    val raw = spark.read.option("mode", "FAILFAST").json(docs)
    val schema = raw.schema
    // int32-vs-double decision for integral columns: one small agg row.
    val longCols = schema.fields.collect { case f if f.dataType == LongType => f.name }
    val fitsInt: Map[String, Boolean] =
      if (longCols.isEmpty) Map.empty
      else {
        // Backtick-quote: JSON documents may legally contain dots in field
        // names; bare col("a.b") would resolve as a nested path.
        val aggs = longCols.flatMap(c => Seq(
          min(quoted(c)).as(s"__mn_$c"), max(quoted(c)).as(s"__mx_$c")))
        val row = raw.agg(aggs.head, aggs.tail: _*).head()
        longCols.map { c =>
          val mn = Option(row.getAs[Any](s"__mn_$c")).fold(0L)(_.asInstanceOf[Long])
          val mx = Option(row.getAs[Any](s"__mx_$c")).fold(0L)(_.asInstanceOf[Long])
          c -> (mn >= Int.MinValue.toLong && mx <= Int.MaxValue.toLong)
        }.toMap
      }
    val cols = schema.fields.map { f =>
      f.dataType match {
        case LongType if fitsInt(f.name) => quoted(f.name).cast(IntegerType).as(f.name)
        case LongType => quoted(f.name).cast(DoubleType).as(f.name)
        // all-null fields parse as NullType or StringType depending on Spark
        // version; both land on the reference's nullable-string default
        case NullType => quoted(f.name).cast(StringType).as(f.name)
        // arrays/objects → variant: persisted as a JSON string (the
        // reference's storage form, table.ts:1383-1387). Note the string is
        // re-serialized from the parsed value, so key order follows the
        // inferred schema, not the input byte order.
        case _: StructType | _: ArrayType | _: MapType => to_json(quoted(f.name)).as(f.name)
        case _ => quoted(f.name)
      }
    }
    raw.select(cols.toSeq: _*)
  }
}
