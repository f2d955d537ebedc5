package graft

import graft.operators.AudioOps
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {

  test("WAV codec round trips samples exactly") {
    val rng = new scala.util.Random(3)
    for (n <- Seq(1, 777, 16000)) {
      val s = Array.fill(n)(rng.nextInt(65536).toShort)
      val dec = AudioOps.decodeWav(AudioOps.encodeWav(s))
      assert(dec.rate == AudioOps.SampleRate && dec.channels == 1)
      assert(dec.samples.sameElements(s), s"roundtrip failed at n=$n")
    }
  }

  test("decoder skips unknown chunks between fmt and data") {
    val s = AudioOps.ruleSamples("aud://7", 1000)
    val wav = AudioOps.encodeWav(s)
    // splice a LIST chunk (8-byte header + 4 payload bytes) before data
    // (data starts at offset 36 in the canonical layout)
    val list = "LIST".getBytes("ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = wav.slice(0, 36) ++ list ++ wav.drop(36)
    // fix RIFF size field (bytes 4-7, LE)
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val dec = AudioOps.decodeWav(spliced)
    assert(dec.samples.sameElements(s))
  }

  test("cross-decoder parity: javax.sound reads our bitstream exactly") {
    val s = AudioOps.ruleSamples("aud://42", 4321)
    val bytes = AudioOps.encodeWav(s)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == AudioOps.SampleRate.toFloat)
    assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    assert(raw.length == s.length * 2)
    val theirs = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val got = Array.fill(s.length)(theirs.get())
    assert(got.sameElements(s), "JDK decode differs from our samples")
  }

  test("stereo is rejected, never silently interleaved") {
    val s = AudioOps.ruleSamples("aud://9", 100)
    val wav = AudioOps.encodeWav(s)
    wav(22) = 2 // fmt channels field (LE u16 at offset 22)
    val e = intercept[IllegalArgumentException] { AudioOps.decodeWav(wav) }
    assert(e.getMessage.contains("mono"))
  }

  test("odd-length unknown chunks keep the RIFF word alignment") {
    val s = AudioOps.ruleSamples("aud://11", 64)
    val wav = AudioOps.encodeWav(s)
    // 5-byte LIST payload → 1 pad byte follows per RIFF word alignment
    val list = "LIST".getBytes("ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0 /* pad */)
    val spliced = wav.slice(0, 36) ++ list ++ wav.drop(36)
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val dec = AudioOps.decodeWav(spliced)
    assert(dec.samples.sameElements(s))
  }

  test("malformed inputs fail cleanly") {
    intercept[IllegalArgumentException] {
      AudioOps.decodeWav("RIFFxxxxJUNK".getBytes("ASCII"))
    }
    intercept[IllegalArgumentException] {
      AudioOps.decodeWav("not audio".getBytes("ASCII"))
    }
  }

  test("fuzz: garbage and mutated WAVs terminate with structured errors") {
    val rng = new scala.util.Random(59)
    val valid = AudioOps.encodeWav(AudioOps.ruleSamples("aud://3", 2000))
    for (trial <- 0 until 200) {
      val bytes = trial % 3 match {
        case 0 => Array.fill(rng.nextInt(120) + 1)(rng.nextInt(256).toByte)
        case 1 =>
          val b = valid.clone()
          b(rng.nextInt(44)) = rng.nextInt(256).toByte // header-zone flip
          b
        case _ => java.util.Arrays.copyOf(valid, rng.nextInt(valid.length) + 1)
      }
      try AudioOps.decodeWav(bytes)
      catch { case _: RuntimeException | _: java.nio.BufferUnderflowException => () }
    }
  }

  test("oversized data-chunk length is rejected before allocation") {
    val valid = AudioOps.encodeWav(AudioOps.ruleSamples("aud://8", 100))
    // data length field sits at offset 40 in the canonical layout
    val b = valid.clone()
    b(40) = 0xff.toByte; b(41) = 0xff.toByte
    b(42) = 0xff.toByte; b(43) = 0x7f.toByte // len = Int.MaxValue
    val e = intercept[IllegalArgumentException] { AudioOps.decodeWav(b) }
    assert(e.getMessage.contains("exceeds remaining"))
  }

  test("processAudio windows and energies are exact") {
    val parts = AudioOps.processAudio("aud://15")
    val secs = AudioOps.durationSecs("aud://15")
    assert(parts.length == secs * 2) // two 0.5s windows per second
    assert(parts.forall(_.n_samples == AudioOps.WindowSamples))
    // independent energy replay from the rule
    val s = AudioOps.ruleSamples("aud://15", AudioOps.SampleRate * secs)
    val expect = s.grouped(AudioOps.WindowSamples).map(
      _.foldLeft(0L)((a, v) => a + v.toLong * v)).toSeq
    assert(parts.map(_.energy) == expect)
  }
}
