package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.VariantType
import org.apache.spark.unsafe.types.VariantVal

/**
 * Byte-level interop with the parquet VariantEncoding format as the
 * reference emits it (reference: src/parquet/variant.ts:21-93 encode,
 * :447+ decode; spec: parquet-format VariantEncoding.md). The vectors below
 * are hand-assembled to the reference's exact layout — metadata header
 * `0x01 | (offsetSize-1)<<6` + dictionary, primitive headers
 * `type_id<<2 | basic_type` (null 0x00, true 0x04, int8 0x0C, int32 0x14,
 * int64 0x18, double 0x1C, short-string `len<<2 | 1`), object basic_type 2,
 * array basic_type 3 — and Spark must decode them; the reverse direction
 * decodes Spark's own `parse_json` bytes with a from-scratch spec decoder.
 */
class VariantInteropSpec extends SparkTestBase {

  private val EmptyMeta = Array[Byte](0x01, 0x00)

  private def variantCol(value: Array[Byte], metadata: Array[Byte]) =
    ColumnShim.column(Literal(new VariantVal(value, metadata), VariantType))

  private def jsonOf(value: Array[Byte], metadata: Array[Byte]): String =
    spark.range(1).select(to_json(variantCol(value, metadata)).as("j"))
      .head().getString(0)

  test("reference-layout primitive vectors decode in Spark") {
    assert(jsonOf(Array(0x00), EmptyMeta) == "null")
    assert(jsonOf(Array(0x04), EmptyMeta) == "true")
    assert(jsonOf(Array(0x08), EmptyMeta) == "false")
    // int8 42 (reference encodeInteger, variant.ts:220-226)
    assert(jsonOf(Array(0x0C, 42), EmptyMeta) == "42")
    // int16 -2 (0x10, little-endian)
    assert(jsonOf(Array(0x10, 0xFE.toByte, 0xFF.toByte), EmptyMeta) == "-2")
    // int32 123456 = 0x0001E240 LE
    assert(jsonOf(Array(0x14, 0x40, 0xE2.toByte, 0x01, 0x00), EmptyMeta) == "123456")
    // int64 2^33 (reference encodeBigInt, 0x18)
    val i64 = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(0x18.toByte).putLong(8589934592L).array()
    assert(jsonOf(i64, EmptyMeta) == "8589934592")
    // double 1.5 (0x1C)
    val dbl = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(0x1C.toByte).putDouble(1.5).array()
    assert(jsonOf(dbl, EmptyMeta) == "1.5")
    // short string "hi": header 0x01 | (2 << 2)
    assert(jsonOf(Array[Byte](0x09, 'h', 'i'), EmptyMeta) == "\"hi\"")
    // long string (>=64 chars): header 0x40 + u32 length LE
    val s = "x" * 70
    val long = java.nio.ByteBuffer.allocate(5 + 70)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(0x40.toByte).putInt(70).put(s.getBytes("UTF-8")).array()
    assert(jsonOf(long, EmptyMeta) == "\"" + s + "\"")
  }

  test("reference-layout object and array vectors decode in Spark") {
    // {"a": 1, "b": "x"} exactly as reference encodeObject/encodeMetadata
    // lay it out: dict ["a","b"], 1-byte offsets/ids.
    val meta = Array[Byte](0x01, 0x02, 0x00, 0x01, 0x02, 'a', 'b')
    val obj = Array[Byte](
      0x02,       // header: basic_type=2, offsetSize=1, idSize=1, small
      0x02,       // numElements
      0x00, 0x01, // field ids (dict order)
      0x00, 0x02, 0x04, // value offsets [0, 2, 4]
      0x0C, 0x01, // int8 1
      0x05, 'x')  // short string "x" (header 0x01 | 1<<2)
    assert(jsonOf(obj, meta) == """{"a":1,"b":"x"}""")

    // variant_get pulls typed fields out of the reference bytes
    val typed = spark.range(1).select(
      variant_get(variantCol(obj, meta), "$.a", "int").as("a"),
      variant_get(variantCol(obj, meta), "$.b", "string").as("b")).head()
    assert(typed.getInt(0) == 1 && typed.getString(1) == "x")

    // [1, 2, "three"] as reference encodeArray: basic_type=3, 1-byte offsets
    val arr = Array[Byte](
      0x03,             // header: basic_type=3, offsetSize=1, small
      0x03,             // numElements
      0x00, 0x02, 0x04, 0x0A, // offsets [0, 2, 4, 10]
      0x0C, 0x01,       // 1
      0x0C, 0x02,       // 2
      0x15, 't', 'h', 'r', 'e', 'e') // short string len 5: 0x01 | 5<<2
    assert(jsonOf(arr, EmptyMeta) == """[1,2,"three"]""")
    // nested: object inside array reuses the object's metadata
    val nested = Array[Byte](
      0x03, 0x01, 0x00, 0x0B.toByte) ++ obj
    assert(jsonOf(nested, meta) == """[{"a":1,"b":"x"}]""")
  }

  test("Spark parse_json bytes decode with a from-scratch spec decoder") {
    val df = spark.range(1).select(
      parse_json(lit("""{"name":"Alice","age":30,"tags":["a","b"],"ok":true,"pi":1.5,"none":null}"""))
        .as("v"))
    val vv = df.head().getAs[VariantVal](0)
    val decoded = MiniVariantDecoder.decode(vv.getValue, vv.getMetadata)
    assert(decoded == Map(
      "name" -> "Alice", "age" -> 30L, "tags" -> Seq("a", "b"),
      "ok" -> true, "pi" -> 1.5, "none" -> null))
  }
}

/** Minimal independent decoder for the VariantEncoding layout (the subset
  * the reference encoder emits) — proves Spark's bytes follow the SAME spec
  * rather than merely round-tripping through Spark itself. */
object MiniVariantDecoder {

  private def readUnsigned(b: Array[Byte], pos: Int, size: Int): Int = {
    var v = 0L
    var i = 0
    while (i < size) { v |= (b(pos + i) & 0xFFL) << (8 * i); i += 1 }
    v.toInt
  }

  private def dictionary(meta: Array[Byte]): IndexedSeq[String] = {
    val offsetSize = ((meta(0) >> 6) & 0x03) + 1
    val n = readUnsigned(meta, 1, offsetSize)
    val offsets = (0 to n).map(i => readUnsigned(meta, 1 + offsetSize * (i + 1), offsetSize))
    val base = 1 + offsetSize * (n + 2)
    (0 until n).map { i =>
      new String(meta, base + offsets(i), offsets(i + 1) - offsets(i), "UTF-8")
    }
  }

  def decode(value: Array[Byte], meta: Array[Byte]): Any =
    decodeAt(value, 0, dictionary(meta))

  private def decodeAt(b: Array[Byte], pos: Int, dict: IndexedSeq[String]): Any = {
    val header = b(pos) & 0xFF
    (header & 0x03) match {
      case 0 => // primitive, type_id = header >> 2
        (header >> 2) match {
          case 0 => null
          case 1 => true
          case 2 => false
          case 3 => b(pos + 1).toLong
          case 4 => readUnsigned(b, pos + 1, 2).toShort.toLong
          case 5 => readUnsigned(b, pos + 1, 4).toLong
          case 6 =>
            java.nio.ByteBuffer.wrap(b, pos + 1, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          case 7 =>
            java.nio.ByteBuffer.wrap(b, pos + 1, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
          case 8 => // decimal4: scale byte + int32 unscaled (Spark's choice
            // for small JSON decimals like 1.5)
            val scale = b(pos + 1) & 0xFF
            BigDecimal(BigInt(readUnsigned(b, pos + 2, 4)), scale).toDouble
          case 9 => // decimal8
            val scale = b(pos + 1) & 0xFF
            val unscaled = java.nio.ByteBuffer.wrap(b, pos + 2, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
            BigDecimal(BigInt(unscaled), scale).toDouble
          case 16 => // long string
            val len = readUnsigned(b, pos + 1, 4)
            new String(b, pos + 5, len, "UTF-8")
          case other => throw new IllegalArgumentException(s"type_id $other")
        }
      case 1 => // short string
        val len = header >> 2
        new String(b, pos + 1, len, "UTF-8")
      case 2 => // object
        val offsetSize = ((header >> 2) & 0x03) + 1
        val idSize = ((header >> 4) & 0x03) + 1
        val isLarge = (header & 0x40) != 0
        val n = if (isLarge) readUnsigned(b, pos + 1, 4) else b(pos + 1) & 0xFF
        val idsBase = pos + 1 + (if (isLarge) 4 else 1)
        val offsBase = idsBase + n * idSize
        val valuesBase = offsBase + (n + 1) * offsetSize
        (0 until n).map { i =>
          val id = readUnsigned(b, idsBase + i * idSize, idSize)
          val off = readUnsigned(b, offsBase + i * offsetSize, offsetSize)
          dict(id) -> decodeAt(b, valuesBase + off, dict)
        }.toMap
      case 3 => // array
        val offsetSize = ((header >> 2) & 0x03) + 1
        val isLarge = (header & 0x10) != 0
        val n = if (isLarge) readUnsigned(b, pos + 1, 4) else b(pos + 1) & 0xFF
        val offsBase = pos + 1 + (if (isLarge) 4 else 1)
        val valuesBase = offsBase + (n + 1) * offsetSize
        (0 until n).map { i =>
          val off = readUnsigned(b, offsBase + i * offsetSize, offsetSize)
          decodeAt(b, valuesBase + off, dict)
        }
    }
  }
}
