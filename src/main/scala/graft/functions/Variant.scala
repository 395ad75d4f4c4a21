package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Variant-column (semi-structured JSON) support.
 *
 * The reference stores arrays/objects as a VARIANT type (JSON-encoded with a
 * binary encoding, src/parquet/variant.ts:21-93) and SHREDS variant fields
 * into typed columns so file statistics / zone maps can prune on them
 * (src/parquet/index.ts:256-326). Spark-first realization:
 *
 *  - the variant column is a plain JSON string column;
 *  - [[inferSchema]] discovers its structure with a distributed pass
 *    (`spark.read.json` over the string dataset — executors parse, the
 *    driver only merges schemas);
 *  - [[shred]] parses each row ONCE (`from_json` into a struct) and
 *    materializes chosen fields as typed top-level columns named
 *    `<variantCol>_<field>`. Written through DeltaTable.write, those typed
 *    columns get per-file min/max stats and participate in file pruning and
 *    parquet row-group skipping — exactly the role shredding plays in the
 *    reference;
 *  - [[get]] is the one-off path extractor (`get_json_object`) for ad-hoc
 *    access without materialization.
 */
object Variant {

  /** Distributed JSON schema inference over a string variant column. */
  def inferSchema(df: DataFrame, jsonCol: String): StructType = {
    val strings = df.select(col(jsonCol)).na.drop()
      .as[String](Encoders.STRING)
    df.sparkSession.read.json(strings).schema
  }

  /** Extract one path as a typed column (no materialization). */
  def get(variant: Column, path: String, dt: DataType): Column =
    get_json_object(variant, s"$$.$path").cast(dt)

  /**
   * Materialize `fields` of the variant column as typed shredded columns.
   * The JSON is parsed once per row into a struct; projection collapse will
   * not duplicate `from_json` (Catalyst treats it as non-cheap), so this
   * stays one parse regardless of how many fields are shredded.
   */
  def shred(df: DataFrame, jsonCol: String, fields: Seq[(String, DataType)]): DataFrame = {
    val schema = StructType(fields.map { case (n, t) => StructField(n, t) })
    val parsed = from_json(col(jsonCol), schema)
    val shredded = fields.map { case (n, _) => parsed.getField(n).as(s"${jsonCol}_$n") }
    df.select(df.columns.map(col).toIndexedSeq ++ shredded: _*)
  }

  /** Shred every field discovered by [[inferSchema]] (top level only). */
  def shredAll(df: DataFrame, jsonCol: String): DataFrame =
    shred(df, jsonCol, inferSchema(df, jsonCol).fields.toSeq.map(f => f.name -> f.dataType))
}
