package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The MediaDecoder seam carrying REAL codec work: WAV (RIFF/PCM16) and PPM
  * (P6) bytes built sample-by-sample here, decoded through the same
  * extractFeatures plumbing the stub uses — only the `decoder` argument
  * changes, which is the seam's whole contract. */
class MultimodalDecoderSpec extends SparkTestBase {
  import spark.implicits._

  /** Minimal PCM16 WAV writer (little-endian RIFF). */
  private def wavBytes(samples: Array[Short], sampleRate: Int,
                       channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def ppmBytes(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n# test image\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = Array.tabulate(w * h * 3) { i =>
      (i % 3 match { case 0 => rgb._1; case 1 => rgb._2; case _ => rgb._3 }).toByte
    }
    header ++ raster
  }

  test("WavDecoder reads real signal statistics from synthesized PCM") {
    // 0.5 s of a full-scale square wave at 100 Hz, 8 kHz mono: rms = 1,
    // peak = 1, duration exactly 500 ms, 100 sign flips per second
    val sr = 8000
    val n = sr / 2
    val square = Array.tabulate(n) { i =>
      val period = sr / 100
      (if ((i / (period / 2)) % 2 == 0) 32767 else -32767).toShort
    }
    val f = Multimodal.WavDecoder.decode(wavBytes(square, sr))
    assert(f(0) == 1.0)          // channels
    assert(f(1) == 8000.0)       // sample rate
    assert(f(2) == 16.0)         // bits
    assert(math.abs(f(3) - 500.0) < 1e-9)  // duration ms
    assert(math.abs(f(4) - 1.0) < 1e-3)    // rms of a square wave
    assert(math.abs(f(5) - 1.0) < 1e-3)    // peak
    assert(f(6) > 0.0 && f(6) < 0.05)      // ~99 crossings / 3999 steps
    assert(math.abs(f(7)) < 0.01)          // ~zero dc offset
  }

  test("WavDecoder skips foreign RIFF chunks and rejects malformed payloads") {
    val sr = 8000
    val tone = Array.tabulate(80)(i =>
      (math.sin(2 * math.Pi * i / 8) * 16384).toShort)
    // splice a LIST chunk between fmt and data
    val plain = wavBytes(tone, sr)
    val fmtEnd = 12 + 8 + 16
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = plain.take(fmtEnd) ++ listChunk ++ plain.drop(fmtEnd)
    // fix RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val f = Multimodal.WavDecoder.decode(spliced)
    assert(f(1) == 8000.0 && f(3) == 10.0)
    // malformed: truncated header, wrong magic → zero vector, no throw
    assert(Multimodal.WavDecoder.decode("RIFFjunk".getBytes).forall(_ == 0.0))
    assert(Multimodal.WavDecoder.decode(plain.take(30)).forall(_ == 0.0))
  }

  test("PpmDecoder parses header, comments and exact channel means") {
    val f = Multimodal.PpmDecoder.decode(ppmBytes(4, 3, (255, 0, 128)))
    assert(f(0) == 4.0 && f(1) == 3.0 && f(2) == 255.0)
    assert(f(3) == 1.0)                       // mean R
    assert(f(4) == 0.0)                       // mean G
    assert(math.abs(f(5) - 128.0 / 255) < 1e-12) // mean B
    assert(f(7) == 12.0)                      // pixel count
    assert(Multimodal.PpmDecoder.decode("P3\n1 1\n255\n0 0 0".getBytes)
      .forall(_ == 0.0)) // ASCII PPM (P3) is a different format: rejected
  }

  test("extractFeatures carries the real decoder through the batched seam") {
    val sr = 8000
    val rows = (0 until 6).map { i =>
      val tone = Array.tabulate(400)(j =>
        (math.sin(2 * math.Pi * j * (i + 1) / 50) * 20000).toShort)
      (i.toLong, wavBytes(tone, sr))
    }
    val records = Multimodal.asMediaRecords(
      rows.toDF("id", "bytes"), "id", "bytes", "audio", "wav")
    val feats = Multimodal.extractFeatures(records, batchSize = 2,
      decoder = Multimodal.WavDecoder)
    assert(feats.count() == 6)
    val got = feats.select(col("media_id"), element_at(col("features"), 2),
        element_at(col("features"), 4))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    // every row decoded with the real parser: sample rate and duration land
    assert(got.forall { case (_, rate, durMs) =>
      rate == 8000.0 && math.abs(durMs - 50.0) < 1e-9 })
    // schema contract unchanged vs the stub path
    assert(feats.columns.toSeq ==
      Seq("media_id", "features", "width", "height"))
  }
}
