package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio modality through the same discipline as the PNG/GIF/JPEG pixel
  * paths: a closed-form PCM rule → REAL RIFF/WAVE encode (fmt + data
  * chunks, 16-bit little-endian PCM) → REAL byte-level decode → windowed
  * integer energy features, hash-gated. A chunk-walk or byte-order bug
  * anywhere in the codec shifts samples and fails the energy checksums.
  *
  * The reference treats media as opaque typed bytes on the prompt side
  * (SURVEY §1.1 media_ref columns); this is the audio instantiation of
  * that contract — metadata + feature extraction without shipping a
  * codec jar, all integer math so DuckDB replays every window.
  */
object AudioOps {

  val SampleRate = 16000
  /** Feature window: 8000 samples = 0.5 s at 16 kHz. */
  val WindowSamples = 8000
  /** 1-in-N doc subset carrying audio payloads. */
  val SubsetMod = 5

  /** Closed-form 16-bit PCM rule: s(i) = ((7i² + 13i + seed) mod 2001)
    * − 1000, seed = md5i("as|ref") mod 1999 — quadratic so runs don't
    * compress to trivial constants, bounded well inside i16.
    */
  def ruleSamples(ref: String, n: Int): Array[Short] = {
    val seed = (Hashing.md5i(s"as|$ref") % 1999L).toInt
    Array.tabulate(n) { i =>
      val v = (7L * i * i + 13L * i + seed) % 2001L
      (v - 1000L).toShort
    }
  }

  /** Seconds of audio for a ref: 1 or 2 (→ 2 or 4 feature windows). */
  def durationSecs(ref: String): Int =
    (1L + Hashing.md5i(s"alen|$ref") % 2L).toInt

  /** Minimal canonical WAV: RIFF header, fmt chunk (PCM, mono, 16-bit),
    * data chunk, little-endian throughout.
    */
  def encodeWav(samples: Array[Short], rate: Int = SampleRate): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(rate)
    bb.putInt(rate * 2) // byte rate
    bb.putShort(2)      // block align
    bb.putShort(16)     // bits/sample
    bb.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  final case class Wav(rate: Int, channels: Int, samples: Array[Short])

  /** Chunk-walking decoder: tolerates extra chunks between fmt and data
    * (LIST/INFO etc.), validates RIFF/WAVE magic and PCM-16 format.
    */
  def decodeWav(bytes: Array[Byte]): Wav = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    bb.getInt()
    require(tag() == "WAVE", "not a WAVE file")
    var rate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (samples == null && bb.remaining() >= 8) {
      val t = tag(); val len = bb.getInt()
      // a negative length would walk the chunk cursor BACKWARD → loop
      require(len >= 0, s"negative chunk length $len")
      t match {
        case "fmt " =>
          val start = bb.position()
          val fmt = bb.getShort()
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = bb.getShort()
          require(channels == 1,
            s"only mono supported, got $channels channels — a stereo " +
            "stream decoded as mono would interleave L/R samples silently")
          rate = bb.getInt()
          bb.getInt(); bb.getShort()
          bits = bb.getShort()
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          bb.position(start + len + (len & 1)) // RIFF chunks are word-aligned
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          // allocation sanity: the declared length must fit the buffer —
          // a corrupt header must not request a multi-GB sample array
          require(len >= 0 && len <= bb.remaining(),
            s"data chunk length $len exceeds remaining ${bb.remaining()}")
          samples = Array.fill(len / 2)(bb.getShort())
        case _ => // skip unknown chunk incl. its odd-length pad byte
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk")
    Wav(rate, channels, samples)
  }

  final case class AudioPart(media_ref: String, win: Long, n_samples: Long,
                             energy: Long)

  /** Rule → encode → decode → per-window integer energy (Σ s², exact in
    * BIGINT: ≤ 8000·10⁶). Narrow per-row kernel, no shuffle.
    */
  def processAudio(ref: String): Seq[AudioPart] = {
    val n = SampleRate * durationSecs(ref)
    val wav = decodeWav(encodeWav(ruleSamples(ref, n)))
    require(wav.rate == SampleRate && wav.samples.length == n)
    wav.samples.grouped(WindowSamples).zipWithIndex.map { case (w, i) =>
      AudioPart(ref, i.toLong, w.length.toLong,
        w.foldLeft(0L)((a, s) => a + s.toLong * s))
    }.toSeq
  }

  /** Driver query: audio subset (doc_id % SubsetMod == 0), one row per
    * (clip, window).
    */
  def audioParts(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") % SubsetMod === 0)
      .select(concat(lit("aud://"), col("doc_id").cast("string")).as("ref"))
      .as[String]
      .mapPartitions(_.flatMap(processAudio)).toDF()
  }
}
