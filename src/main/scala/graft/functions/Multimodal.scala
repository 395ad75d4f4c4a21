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

  /**
   * Decoder seam: a real deployment plugs a codec/model here (javacv,
   * ONNX runtime, ...) and nothing else changes — the batching, schema,
   * and partitioning contracts in [[extractFeatures]] are decoder-agnostic.
   * `open()` is invoked once per batch so implementations can amortize
   * expensive codec/session setup across `batchSize` rows.
   */
  trait MediaDecoder extends Serializable {
    /** Per-batch setup hook (decoder/model init); default no-op. */
    def open(): Unit = {}
    def decode(payload: Array[Byte]): Array[Double]
  }

  /** ??? in spirit: a real deployment decodes pixels/samples here. The stub
    * emits a deterministic 8-double "feature vector" from the payload bytes so
    * downstream schema/partitioning logic is fully exercisable. Each bucket is
    * an EXACT integer byte sum divided once in double precision, so any engine
    * recomputes it bit-identically (the t9 oracle does, in DuckDB SQL). */
  object StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte]): Array[Double] = decodeStub(payload)
  }

  /**
   * REAL decoder for RIFF/WAVE audio (PCM16) — pure JDK, public format:
   * walks the chunk list, reads the `fmt ` block and the `data` samples,
   * and emits an 8-double feature vector of genuine signal statistics:
   * [channels, sampleRate, bitsPerSample, durationMs, rms, peak,
   * zeroCrossingRate, dcOffset] (amplitude stats normalized to [-1,1]).
   * Proves the [[MediaDecoder]] seam carries real codec work: swapping
   * [[StubDecoder]] for this changes only the `decoder` argument.
   * Malformed payloads yield the zero vector (a decode seam must not fail
   * the whole partition on one bad file).
   */
  object WavDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte]): Array[Double] = {
      val zero = Array.fill(8)(0.0)
      if (payload == null || payload.length < 44) return zero
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(off: Int) = new String(payload, off, 4, "US-ASCII")
      if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return zero
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var off = 12
      while (off + 8 <= payload.length) {
        val id = tag4(off)
        val sz = bb.getInt(off + 4)
        if (sz < 0 || off + 8 + sz > payload.length) return zero
        id match {
          case "fmt " if sz >= 16 =>
            channels = bb.getShort(off + 10).toInt
            sampleRate = bb.getInt(off + 12)
            bits = bb.getShort(off + 22).toInt
          case "data" => dataOff = off + 8; dataLen = sz
          case _ => () // LIST/INFO/etc: skipped, per the RIFF spec
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) return zero
      val n = dataLen / 2
      if (n == 0) return zero
      var sumSq = 0.0; var sum = 0.0; var peak = 0.0; var crossings = 0L
      var prevSign = 0
      var i = 0
      while (i < n) {
        val s = bb.getShort(dataOff + 2 * i) / 32768.0
        sumSq += s * s; sum += s
        val a = math.abs(s); if (a > peak) peak = a
        val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
        i += 1
      }
      val frames = n / channels
      val durationMs = frames * 1000.0 / sampleRate
      Array(channels.toDouble, sampleRate.toDouble, bits.toDouble,
        durationMs, math.sqrt(sumSq / n), peak,
        crossings.toDouble / math.max(1, n - 1), sum / n)
    }
  }

  /**
   * REAL decoder for binary PPM images (P6) — pure JDK, public format:
   * parses the ASCII header (magic, comments, width/height/maxval) and the
   * raw RGB raster, emitting [width, height, maxval, meanR, meanG, meanB,
   * meanLuma, pixelCount] with channel means normalized by maxval.
   * Malformed payloads yield the zero vector.
   */
  object PpmDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte]): Array[Double] = {
      val zero = Array.fill(8)(0.0)
      if (payload == null || payload.length < 11 ||
        payload(0) != 'P' || payload(1) != '6') return zero
      var pos = 2
      def nextInt(): Int = {
        // skip whitespace and '#'-comments between header tokens
        var done = false
        while (!done && pos < payload.length) {
          val c = payload(pos)
          if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
          else done = true
        }
        var v = 0; var any = false
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1; any = true
        }
        if (any) v else -1
      }
      val w = nextInt(); val h = nextInt(); val maxv = nextInt()
      pos += 1 // single whitespace after maxval, then raster
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 ||
        pos + 3L * w * h > payload.length) return zero
      var r = 0L; var g = 0L; var b = 0L
      val n = w * h
      var i = 0
      while (i < n) {
        r += payload(pos + 3 * i) & 0xff
        g += payload(pos + 3 * i + 1) & 0xff
        b += payload(pos + 3 * i + 2) & 0xff
        i += 1
      }
      val d = n.toDouble * maxv
      val (mr, mg, mb) = (r / d, g / d, b / d)
      Array(w.toDouble, h.toDouble, maxv.toDouble, mr, mg, mb,
        0.2126 * mr + 0.7152 * mg + 0.0722 * mb, n.toDouble)
    }
  }

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

  /** Narrow typed rows in/out of the decode boundary — the binary payload
    * enters, only features leave, so no shuffle ever carries media bytes.
    * (Public: encoder-generated deserializers instantiate these from
    * outside this object's scope.) */
  case class MediaIn(media_id: Long, payload: Array[Byte],
                     width: Int, height: Int)
  case class MediaFeatures(media_id: Long, features: Seq[Double],
                           width: Int, height: Int)

  /**
   * Batched per-partition feature extraction — the Scala analog of
   * `mapInPandas`: each partition's rows stream through in `batchSize`
   * groups and `decoder.open()` runs once per batch (amortizing codec/model
   * setup). Runs as `Dataset.mapPartitions` over Tungsten rows — a
   * DeserializeToObject/SerializeFromObject pair in the plan, NOT an RDD
   * scan, so the surrounding stages keep columnar input and codegen.
   * Output schema is fixed and narrow (features only, no payload), so the
   * expensive binary column is dropped before any shuffle.
   */
  def extractFeatures(records: DataFrame, batchSize: Int = 64,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.select(col("media_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaIn]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          decoder.open()
          batch.iterator.map(r => MediaFeatures(
            r.media_id, decoder.decode(r.payload).toSeq, r.width, r.height))
        }
      }
      .toDF()
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
