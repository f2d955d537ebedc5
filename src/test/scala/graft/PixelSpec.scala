package graft

import graft.operators.PixelOps
import graft.vision.PixelKernel
import graft.vision.PixelKernel.Rgb
import org.scalatest.funsuite.AnyFunSuite

/** Pixel kernel invariants, mirroring the reference's vision tests
  * (ref crates/core/tests/vision_weights.rs: global-view parity,
  * tile counts, resample agreement).
  */
class PixelSpec extends AnyFunSuite {

  private def ruleImg(ref: String, w: Int, h: Int): Rgb =
    PixelOps.rulePixels(ref, w, h)

  test("PNG round trip: every filter type decodes back to the source") {
    for ((w, h) <- Seq((16, 16), (32, 16), (16, 32), (32, 32), (7, 5));
         f <- -1 to 4) {
      val img = ruleImg(s"img://$w/$h", w, h)
      val filterOf: Int => Int = if (f < 0) (_ % 5) else (_ => f)
      val dec = PixelKernel.decodePng(PixelKernel.encodePng(img, filterOf))
      assert(dec.w == w && dec.h == h)
      assert(dec.data.sameElements(img.data), s"mismatch at ${w}x$h filter $f")
    }
  }

  test("PNG decode verifies CRCs and rejects corrupt bytes") {
    val img = ruleImg("img://9/9", 16, 16)
    val png = PixelKernel.encodePng(img)
    val bad = png.clone()
    bad(40) = (bad(40) ^ 0x7f).toByte // inside IDAT payload
    intercept[IllegalArgumentException] {
      PixelKernel.decodePng(bad)
    }
    intercept[IllegalArgumentException] {
      PixelKernel.decodePng("nope".getBytes)
    }
  }

  test("coeffs: identity scale is a single full-weight tap; rows sum to 2^22") {
    val id = PixelKernel.computeCoeffs(16, 16)
    id.zipWithIndex.foreach { case (t, oi) =>
      val nz = t.weights.zipWithIndex.filter(_._1 != 0)
      assert(nz.length == 1 && nz.head._1 == (1 << 22))
      assert(t.xmin + nz.head._2 == oi)
    }
    for ((in, out) <- Seq((16, 8), (32, 16), (64, 32))) {
      PixelKernel.computeCoeffs(in, out).foreach { t =>
        val sum = t.weights.map(_.toLong).sum
        assert(math.abs(sum - (1L << 22)) <= t.weights.length,
          s"weights sum $sum for $in->$out")
      }
    }
  }

  test("resize: identity is exact; constant images stay constant") {
    val img = ruleImg("img://1/0", 32, 32)
    assert(PixelKernel.resizeBicubic(img, 32, 32).data.sameElements(img.data))
    for (v <- Seq(0, 1, 127, 200, 255)) {
      val const = Rgb(32, 32, Array.fill(32 * 32 * 3)(v.toByte))
      val out = PixelKernel.resizeBicubic(const, 16, 16)
      assert(out.data.forall(b => (b & 0xff) == v), s"constant $v drifted")
    }
  }

  test("resize: downscale-by-2 of a linear ramp hits ramp midpoints (interior)") {
    // bicubic a=-0.5 reproduces linear signals exactly away from edges
    val w = 32; val h = 8
    val data = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      data((y * w + x) * 3 + c) = (8 * x).toByte // 0..248 ramp in x
    val out = PixelKernel.resizeBicubic(Rgb(w, h, data), 16, 4)
    for (x <- 2 until 14) {
      val expected = 16 * x + 4 // ramp at the window center (2x+0.5)*8
      val got = out.data(x * 3) & 0xff
      assert(math.abs(got - expected) <= 1, s"col $x: $got vs $expected")
    }
  }

  test("global view: letterbox gray bands, centered paste, exact dims") {
    val img = ruleImg("img://2/0", 16, 32) // rw=1, rh=2 -> new 8x16, xoff 4
    val gv = PixelKernel.buildGlobalView(img, 16)
    assert(gv.w == 16 && gv.h == 16)
    for (y <- 0 until 16; x <- (0 until 4) ++ (12 until 16); c <- 0 until 3)
      assert((gv.data((y * 16 + x) * 3 + c) & 0xff) == 127, s"($x,$y) not gray")
    // center region equals the direct 8x16 resize
    val resized = PixelKernel.resizeBicubic(img, 8, 16)
    for (y <- 0 until 16; x <- 0 until 8; c <- 0 until 3)
      assert(gv.data((y * 16 + x + 4) * 3 + c) == resized.data((y * 8 + x) * 3 + c))
    // square input -> pure resize, no gray anywhere guaranteed only for
    // identity: 16x16 input is pasted verbatim
    val sq = ruleImg("img://3/0", 16, 16)
    assert(PixelKernel.buildGlobalView(sq, 16).data.sameElements(sq.data))
  }

  test("tiles: crops reproduce the pixel rule at their offsets") {
    val ref = "img://4/0"
    val img = ruleImg(ref, 32, 32)
    val tiles = PixelKernel.cropTiles(img, 16)
    assert(tiles.length == 4)
    for (ti <- 0 until 4) {
      val x0 = (ti % 2) * 16; val y0 = (ti / 2) * 16
      for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
        assert(tiles(ti).data((y * 16 + x) * 3 + c) ==
          img.data(((y0 + y) * 32 + x0 + x) * 3 + c))
    }
  }

  test("checksums: hand-computed 1x1 case; CHW vs interleaved orders differ") {
    val px = Rgb(1, 1, Array[Byte](10, 20, 30))
    // pix: fold over [10,20,30] = (10*31+20)*31+30
    assert(PixelKernel.pixelChecksum(px) == ((10L * 31 + 20) * 31 + 30))
    // norm: fold over CHW numerators [20,40,60]
    assert(PixelKernel.normChecksum(px) == ((20L * 31 + 40) * 31 + 60))
    val twoPx = Rgb(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    // interleaved [1,2,3,4,5,6] vs CHW doubled [2,8,4,10,6,12]
    assert(PixelKernel.pixelChecksum(twoPx) != PixelKernel.normChecksum(twoPx))
  }

  test("kernel is size-generic: reference 640-px geometry end-to-end") {
    // the mm_pixels query runs 16-px geometry for oracle tractability;
    // the kernel itself must handle the reference's real sizes
    // (preprocess.rs image_size=640, model base_size=640). One 1280x640
    // image (ratio 2x1): encode->decode round trip, 2 tiles + thumbnail
    // path shape, letterboxed global view with exact gray bands.
    val img = ruleImg("img://full/0", 1280, 640)
    val dec = PixelKernel.decodePng(PixelKernel.encodePng(img))
    assert(dec.data.sameElements(img.data))
    val tiles = PixelKernel.cropTiles(PixelKernel.resizeBicubic(dec, 1280, 640), 640)
    assert(tiles.length == 2 && tiles.forall(t => t.w == 640 && t.h == 640))
    val gv = PixelKernel.buildGlobalView(dec, 640)
    assert(gv.w == 640 && gv.h == 640)
    // scale 0.5 -> new 640x320, yoff = 160: rows 0..159 and 480..639 gray
    for (y <- Seq(0, 100, 159, 480, 600, 639); x <- Seq(0, 320, 639))
      assert((gv.data((y * 640 + x) * 3) & 0xff) == 127, s"($x,$y)")
    // pasted band is the direct 640x320 bicubic downscale
    val resized = PixelKernel.resizeBicubic(dec, 640, 320)
    for (y <- Seq(160, 300, 479); x <- Seq(0, 111, 639); c <- 0 until 3)
      assert(gv.data((y * 640 + x) * 3 + c) ==
        resized.data(((y - 160) * 640 + x) * 3 + c), s"($x,$y,$c)")
  }

  test("processRef: rw*rh tiles + global, all 16x16, deterministic") {
    val ref = "img://100/0"
    val parts = PixelOps.processRef(ref)
    val rw = PixelOps.ratioW(ref); val rh = PixelOps.ratioH(ref)
    assert(parts.length == rw * rh + 1)
    assert(parts.last.part == "global")
    assert(parts.forall(p => p.width == 16 && p.height == 16))
    assert(parts == PixelOps.processRef(ref)) // determinism
  }
}
