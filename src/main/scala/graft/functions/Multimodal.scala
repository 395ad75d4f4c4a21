package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing for training-data pipelines.
 *
 * Media payloads ride as opaque `binary` columns with a typed metadata
 * struct; the Spark-side structure — schema, per-partition batched
 * processing, deterministic feature extraction shape — is real and tested,
 * while the actual codec work is STUBBED (`decodeStub`) with a deterministic
 * fake, since no image/audio libraries exist in this environment. Swapping
 * the stub for a real decoder (e.g. javacv) changes only the function body:
 * the partitioning, batching, and schema contracts stay identical.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val MediaMetadataType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png/jpeg/wav/mp4/...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val MediaRecordType: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", MediaMetadataType)))

  /** Wrap raw binary into the media-record shape (metadata inferred from the
    * payload deterministically — fake dimensions derived from content hash,
    * real sizes from the bytes). */
  def asMediaRecords(df: DataFrame, idCol: String, payloadCol: String,
                     mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        (pmod(xxhash64(col(payloadCol)), lit(1920L)) + 1).cast(IntegerType).as("width"),
        (pmod(xxhash64(col(payloadCol), lit(1L)), lit(1080L)) + 1).cast(IntegerType).as("height"),
        pmod(xxhash64(col(payloadCol), lit(2L)), lit(600000L)).as("duration_ms"),
        length(col(payloadCol)).cast(LongType).as("size_bytes")).as("meta"))

  /** ??? in spirit: a real deployment decodes pixels/samples here. The stub
    * emits a deterministic 8-double "feature vector" from the payload bytes so
    * downstream schema/partitioning logic is fully exercisable. Each bucket is
    * an EXACT integer byte sum divided once in double precision, so any engine
    * recomputes it bit-identically (the t9 oracle does, in DuckDB SQL). */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    // Deterministic fake: 8 strided byte-sum moments of the stream.
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0)
    val sums = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      sums(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    val denom = 255.0 * math.max(1, payload.length / 8)
    sums.map(_ / denom)
  }

  private val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("features", ArrayType(DoubleType)),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /**
   * Batched per-partition feature extraction — the Scala analog of
   * `mapInPandas`: each partition's rows stream through in `batchSize`
   * groups (a real decoder would amortize codec/model setup per batch).
   * Output schema is fixed and narrow (features only, no payload), so the
   * expensive binary column is dropped before any shuffle.
   */
  def extractFeatures(records: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = records.sparkSession
    val rdd = records.select("media_id", "payload", "meta.width", "meta.height")
      .rdd.mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would live here (decoder/model init)
          batch.iterator.map { r =>
            val feats = decodeStub(r.getAs[Array[Byte]]("payload"))
            Row(r.getAs[Long]("media_id"), feats.toSeq,
              r.getAs[Int]("width"), r.getAs[Int]("height"))
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Resize stub: recomputes metadata only (a real impl transforms pixels). */
  def resize(records: DataFrame, w: Int, h: Int): DataFrame =
    records.withColumn("meta", struct(
      col("meta.media_type"), col("meta.format"),
      lit(w).as("width"), lit(h).as("height"),
      col("meta.duration_ms"), col("meta.size_bytes")))

  /** Frame-sample stub for video: one synthetic frame id per `everyMs`. */
  def sampleFrames(records: DataFrame, everyMs: Long): DataFrame =
    records
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"),
        xxhash64(col("payload"), col("frame_ms")).as("frame_fingerprint"))
}
