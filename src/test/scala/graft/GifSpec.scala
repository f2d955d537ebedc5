package graft

import graft.operators.PixelOps
import graft.vision.GifKernel
import graft.vision.GifKernel.Indexed
import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  private def roundTrip(img: Indexed): Unit = {
    val dec = GifKernel.decodeGif(GifKernel.encodeGif(img))
    assert(dec.w == img.w && dec.h == img.h)
    assert(java.util.Arrays.equals(dec.idx, img.idx), "index raster differs")
    assert(java.util.Arrays.equals(dec.palette, img.palette), "palette differs")
  }

  test("LZW round trip: random rasters across the width-bump boundaries") {
    val rng = new scala.util.Random(7)
    // 90000 random indices force the dictionary through every code width
    // (9→12 bits) and past 4096 entries (CLEAR + reset mid-stream)
    for ((w, h) <- Seq((16, 16), (33, 7), (200, 150), (300, 300))) {
      val idx = Array.fill(w * h)(rng.nextInt(256).toByte)
      roundTrip(Indexed(w, h, idx, PixelOps.gifPalette))
    }
  }

  test("LZW round trip: degenerate rasters (constant, runs, KwKwK chains)") {
    roundTrip(Indexed(100, 100, Array.fill(10000)(0.toByte), PixelOps.gifPalette))
    val ramp = Array.tabulate(64 * 64)(i => (i % 256).toByte)
    roundTrip(Indexed(64, 64, ramp, PixelOps.gifPalette))
    // aaa... of alternating pairs — classic code==nextCode stress
    val ab = Array.tabulate(5000)(i => (i % 2).toByte)
    roundTrip(Indexed(100, 50, ab, PixelOps.gifPalette))
  }

  test("rule images round trip at every tile grid") {
    for (rw <- 1 to 2; rh <- 1 to 2) {
      val img = PixelOps.ruleGifIndexed(s"img://$rw$rh/0", 16 * rw, 16 * rh)
      roundTrip(img)
    }
  }

  test("decoder skips extension blocks (89a graphic control)") {
    val img = PixelOps.ruleGifIndexed("img://42/0", 16, 16)
    val bytes = GifKernel.encodeGif(img)
    // splice a graphic-control extension between the color table and the
    // image descriptor (offset 13 + 768)
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = bytes.slice(0, 13 + 768) ++ ext ++ bytes.drop(13 + 768)
    val dec = GifKernel.decodeGif(spliced)
    assert(java.util.Arrays.equals(dec.idx, img.idx))
  }

  test("fuzz: garbage / mutated / truncated bitstreams terminate structurally") {
    val rng = new scala.util.Random(41)
    val valid = GifKernel.encodeGif(PixelOps.ruleGifIndexed("img://5/0", 32, 32))
    for (trial <- 0 until 200) {
      val bytes = trial % 3 match {
        case 0 => Array.fill(rng.nextInt(100) + 1)(rng.nextInt(256).toByte)
        case 1 =>
          val b = valid.clone()
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
          b
        case _ => java.util.Arrays.copyOf(valid, rng.nextInt(valid.length) + 1)
      }
      // property: always terminates; failures are structured
      // RuntimeExceptions, never a hang or a multi-GB allocation
      try GifKernel.decodeGif(bytes)
      catch { case _: RuntimeException => () }
    }
  }

  test("implausible raster dims are rejected before allocation") {
    val valid = GifKernel.encodeGif(PixelOps.ruleGifIndexed("img://6/0", 16, 16))
    // image descriptor starts after header(13) + global table(768)
    val desc = 13 + 768
    assert((valid(desc) & 0xff) == 0x2c)
    val b = valid.clone()
    b(desc + 5) = 0xff.toByte; b(desc + 6) = 0xff.toByte // w = 65535
    b(desc + 7) = 0xff.toByte; b(desc + 8) = 0xff.toByte // h = 65535
    val e = intercept[IllegalArgumentException] { GifKernel.decodeGif(b) }
    assert(e.getMessage.contains("implausible raster"))
  }

  test("toRgb expands through the palette exactly") {
    val img = Indexed(2, 1, Array[Byte](0, 255.toByte), PixelOps.gifPalette)
    val rgb = GifKernel.toRgb(img)
    assert(rgb.data.map(_ & 0xff).toSeq ==
      Seq(0, 11, 17, 255, (7 * 255 + 11) % 256, (13 * 255 + 17) % 256))
  }

  test("processGif emits the right part set per grid") {
    val parts = PixelOps.processGif("img://0/0")
    val rw = PixelOps.gifRatioW("img://0/0"); val rh = PixelOps.gifRatioH("img://0/0")
    assert(parts.length == rw * rh + 1)
    assert(parts.last.part == "global")
    assert(parts.forall(p => p.pix_fp >= 0 && p.norm_fp >= 0))
  }
}
