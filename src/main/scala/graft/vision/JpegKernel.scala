package graft.vision

import graft.vision.PixelKernel.Rgb

/** Baseline JFIF (SOF0) codec, pure JVM — the last pixel format the
  * reference decodes that this engine didn't (ref Cargo.toml:12 pulls the
  * `image` crate; cli/app.rs:95-101 `image::open` handles PNG/JPEG/GIF
  * alike). Same division of labor as the PNG/GIF paths: a REAL entropy
  * layer (canonical Huffman per ITU-T T.81 Annex C/F, byte stuffing,
  * restart markers, DC prediction) feeding dequant → inverse zigzag →
  * exact double-precision IDCT → level shift.
  *
  * Encoder: grayscale or 4:4:4 YCbCr, standard Annex K Huffman tables,
  * caller-supplied quant table, optional restart interval.
  * Decoder: baseline grayscale, 4:4:4 and 4:2:0 (replicated chroma
  * upsample), multi-table DQT/DHT segments, DRI/RSTn, APPn/COM skip.
  *
  * The mm_jpeg_pixels gate rides block-constant images with a DC quant
  * step of 8: a constant 8×8 block has AC≡0 and DC = 8·(v−128), which
  * the step-8 quantizer and the exact IDCT round-trip bit-exactly — so
  * decoded pixels equal the closed-form rule and DuckDB replays them
  * without modeling the DCT. The general-coefficient paths are pinned by
  * JpegSpec instead: coefficient-level entropy round-trips and a
  * cross-decoder parity check against the JDK's ImageIO JPEG codec.
  */
object JpegKernel {

  /** Row-major 8-bit luma plane. */
  final case class Gray(w: Int, h: Int, data: Array[Byte]) {
    require(data.length == w * h, s"gray size ${data.length} != ${w}x$h")
  }

  def toRgb(g: Gray): Rgb = {
    val out = new Array[Byte](g.w * g.h * 3)
    var i = 0
    while (i < g.w * g.h) {
      out(i * 3) = g.data(i); out(i * 3 + 1) = g.data(i)
      out(i * 3 + 2) = g.data(i); i += 1
    }
    Rgb(g.w, g.h, out)
  }

  // ------------------------------------------------------------ tables

  /** Zigzag scan order: index = zigzag position, value = natural index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quant table (natural order) with the DC step
    * forced to 8 — divides 8·(v−128) exactly, making constant blocks
    * round-trip bit-exactly (see object doc). AC steps untouched.
    */
  val DcExactQuant: Array[Int] = {
    val k1 = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    k1(0) = 8
    k1
  }

  /** All-ones quant table: lossless-after-DCT-rounding, for tests that
    * want the entropy layer to carry dense AC coefficients.
    */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  // Annex K.3 standard Huffman tables: (bits per length 1..16, values).
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical code assignment (T.81 Annex C): value → (code, length). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  /** Canonical decode table: per length, first code + first value index. */
  private final class DecodeTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // exclusive
    val valIdx = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        minCode(len) = code; valIdx(len) = k
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = code
        code <<= 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | in.readBit()
        len += 1
        if (code < maxCode(len)) return vals(valIdx(len) + (code - minCode(len))) & 0xff
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
  }

  // ------------------------------------------------------------ DCT

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(u*8+x) = C(u) * cos((2x+1)uπ/16) / 2
    for (u <- 0 until 8; x <- 0 until 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      t(u * 8 + x) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
    }
    t
  }

  /** Forward DCT of one level-shifted 8×8 block (natural order). */
  def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    for (y <- 0 until 8; u <- 0 until 8) { // rows
      var s = 0.0
      var x = 0
      while (x < 8) { s += block(y * 8 + x) * CosTable(u * 8 + x); x += 1 }
      tmp(y * 8 + u) = s
    }
    for (u <- 0 until 8; v <- 0 until 8) { // cols
      var s = 0.0
      var y = 0
      while (y < 8) { s += tmp(y * 8 + u) * CosTable(v * 8 + y); y += 1 }
      out(v * 8 + u) = s
    }
    out
  }

  /** Exact inverse DCT (transpose of [[fdct]]); output pre-level-shift. */
  def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    for (v <- 0 until 8; x <- 0 until 8) { // rows of coef in u
      var s = 0.0
      var u = 0
      while (u < 8) { s += coef(v * 8 + u) * CosTable(u * 8 + x); u += 1 }
      tmp(v * 8 + x) = s
    }
    for (x <- 0 until 8; y <- 0 until 8) {
      var s = 0.0
      var v = 0
      while (v < 8) { s += tmp(v * 8 + x) * CosTable(v * 8 + y); v += 1 }
      out(y * 8 + x) = s
    }
    out
  }

  // ------------------------------------------------------------ bit I/O

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** 1-pad to a byte boundary (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) write(0xff, 8 - nbits)
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val next = bytes(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed
          else throw new IllegalArgumentException(f"marker 0xff$next%02x inside entropy data")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Drop partial bits and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      if ((bytes(pos) & 0xff) != 0xff || (bytes(pos + 1) & 0xff) != (0xd0 + n))
        throw new IllegalArgumentException("expected restart marker")
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): map an n-bit magnitude code to its value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // ------------------------------------------------------------ encoder

  /** Quantized coefficient blocks (natural order) for one plane. */
  def quantizeBlocks(plane: Gray, quant: Array[Int]): Array[Array[Int]] = {
    val bw = (plane.w + 7) / 8; val bh = (plane.h + 7) / 8
    val blocks = new Array[Array[Int]](bw * bh)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val blk = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        // edge replication padding for non-multiple-of-8 dims
        val sx = math.min(bx * 8 + x, plane.w - 1)
        val sy = math.min(by * 8 + y, plane.h - 1)
        blk(y * 8 + x) = (plane.data(sy * plane.w + sx) & 0xff) - 128.0
      }
      val f = fdct(blk)
      blocks(by * bw + bx) = Array.tabulate(64)(i => math.round(f(i) / quant(i)).toInt)
    }
    blocks
  }

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
                       body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write(len >> 8); out.write(len & 0xff); out.write(body, 0, body.length)
  }

  private def encodeBlock(bw: BitWriter, coef: Array[Int], dcPred: Int,
                          dcTab: Array[(Int, Int)], acTab: Array[(Int, Int)]): Int = {
    val dc = coef(0)
    val diff = dc - dcPred
    val t = category(diff)
    val (dcode, dlen) = dcTab(t)
    bw.write(dcode, dlen)
    if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var run = 0
    for (zi <- 1 until 64) {
      val v = coef(Zigzag(zi))
      if (v == 0) run += 1
      else {
        while (run > 15) { val (c, l) = acTab(0xf0); bw.write(c, l); run -= 16 }
        val s = category(v)
        val (c, l) = acTab((run << 4) | s)
        bw.write(c, l)
        bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
    }
    if (run > 0) { val (c, l) = acTab(0x00); bw.write(c, l) } // EOB
    dc
  }

  /** Baseline grayscale encode: standard Huffman, caller quant table,
    * optional restart interval (in MCUs).
    */
  def encodeGray(img: Gray, quant: Array[Int] = DcExactQuant,
                 restartInterval: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSeg(out, 0xe0, Array[Byte](0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSeg(out, 0xdb, (0.toByte +: Zigzag.map(i => quant(i).toByte)))
    writeSeg(out, 0xc0, Array[Byte](8,
      (img.h >> 8).toByte, (img.h & 0xff).toByte,
      (img.w >> 8).toByte, (img.w & 0xff).toByte,
      1, 1, 0x11, 0))
    writeSeg(out, 0xc4, (0x00.toByte +: (DcLumaBits.map(_.toByte) ++ DcLumaVals)))
    writeSeg(out, 0xc4, (0x10.toByte +: (AcLumaBits.map(_.toByte) ++ AcLumaVals)))
    if (restartInterval > 0)
      writeSeg(out, 0xdd, Array[Byte]((restartInterval >> 8).toByte,
        (restartInterval & 0xff).toByte))
    writeSeg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val dcTab = buildEncodeTable(DcLumaBits, DcLumaVals)
    val acTab = buildEncodeTable(AcLumaBits, AcLumaVals)
    val blocks = quantizeBlocks(img, quant)
    val bw = new BitWriter(out)
    var dcPred = 0
    var rst = 0
    for ((blk, i) <- blocks.zipWithIndex) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bw.flush()
        out.write(0xff); out.write(0xd0 + rst); rst = (rst + 1) % 8
        dcPred = 0
      }
      dcPred = encodeBlock(bw, blk, dcPred, dcTab, acTab)
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Baseline 4:4:4 YCbCr encode of an RGB image (JFIF color transform,
    * all three components sharing the luma Huffman/quant tables).
    */
  def encodeRgb444(img: Rgb, quant: Array[Int] = DcExactQuant): Array[Byte] = {
    val n = img.w * img.h
    val planes = Array.fill(3)(new Array[Byte](n))
    var i = 0
    while (i < n) {
      val r = img.data(i * 3) & 0xff; val g = img.data(i * 3 + 1) & 0xff
      val b = img.data(i * 3 + 2) & 0xff
      def cl(v: Double): Byte = math.max(0, math.min(255, math.round(v))).toByte
      planes(0)(i) = cl(0.299 * r + 0.587 * g + 0.114 * b)
      planes(1)(i) = cl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      planes(2)(i) = cl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    writeSeg(out, 0xdb, (0.toByte +: Zigzag.map(i => quant(i).toByte)))
    writeSeg(out, 0xc0, Array[Byte](8,
      (img.h >> 8).toByte, (img.h & 0xff).toByte,
      (img.w >> 8).toByte, (img.w & 0xff).toByte,
      3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    writeSeg(out, 0xc4, (0x00.toByte +: (DcLumaBits.map(_.toByte) ++ DcLumaVals)))
    writeSeg(out, 0xc4, (0x10.toByte +: (AcLumaBits.map(_.toByte) ++ AcLumaVals)))
    writeSeg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dcTab = buildEncodeTable(DcLumaBits, DcLumaVals)
    val acTab = buildEncodeTable(AcLumaBits, AcLumaVals)
    val blocks = planes.map(p => quantizeBlocks(Gray(img.w, img.h, p), quant))
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val nBlocks = blocks(0).length
    for (b <- 0 until nBlocks; c <- 0 until 3) // 4:4:4 MCU = one block each
      dcPred(c) = encodeBlock(bw, blocks(c)(b), dcPred(c), dcTab, acTab)
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ------------------------------------------------------------ decoder

  final case class Component(id: Int, h: Int, v: Int, tq: Int,
                              var td: Int = 0, var ta: Int = 0)

  /** Decoded scan at the coefficient level: per component, DEQUANTIZED
    * blocks in natural order, at component resolution (for tests and for
    * the pixel stage). `grids` carries each component's block-grid
    * (width, height) — MCU-padded for interleaved scans, exact
    * ceil(dim/8) for a non-interleaved single-component scan.
    */
  final case class Coefficients(w: Int, h: Int,
      comps: Seq[(Component, Array[Array[Int]])], grids: Seq[(Int, Int)])

  def decodeCoefficients(bytes: Array[Byte]): Coefficients = {
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecodeTable](4)
    val acTabs = new Array[DecodeTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    var scanComps: Array[Component] = null
    while (scanComps == null) {
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      val body = pos + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var o = body
          while (o < pos + 2 + len) {
            val pq = (bytes(o) & 0xff) >> 4; val tq = bytes(o) & 0x0f
            val t = new Array[Int](64)
            for (zi <- 0 until 64)
              t(Zigzag(zi)) =
                if (pq == 0) bytes(o + 1 + zi) & 0xff
                else u16(o + 1 + 2 * zi)
            quant(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xc4 => // DHT: one or more tables
          var o = body
          while (o < pos + 2 + len) {
            val tc = (bytes(o) & 0xff) >> 4; val th = bytes(o) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val nv = bits.sum
            val vals = java.util.Arrays.copyOfRange(bytes, o + 17, o + 17 + nv)
            val tab = new DecodeTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            o += 17 + nv
          }
        case 0xc0 => // SOF0 baseline
          require((bytes(body) & 0xff) == 8, "only 8-bit precision")
          h = u16(body + 1); w = u16(body + 3)
          // allocation sanity: a fuzzed/corrupt SOF must not request a
          // multi-GB plane — fail structured before any buffer exists
          require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024,
            s"implausible frame ${w}x$h")
          val nf = bytes(body + 5) & 0xff
          require(nf >= 1 && nf <= 4, s"implausible component count $nf")
          comps = Array.tabulate(nf) { i =>
            val o = body + 6 + 3 * i
            Component(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
              bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
          }
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 =>
          throw new IllegalArgumentException(f"unsupported SOF marker 0xff$m%02x (not baseline)")
        case 0xdd => restartInterval = u16(body)
        case 0xda => // SOS
          val ns = bytes(body) & 0xff
          scanComps = Array.tabulate(ns) { i =>
            val id = bytes(body + 1 + 2 * i) & 0xff
            val c = comps.find(_.id == id).getOrElse(
              throw new IllegalArgumentException(s"scan component $id not in frame"))
            c.td = (bytes(body + 2 + 2 * i) & 0xff) >> 4
            c.ta = bytes(body + 2 + 2 * i) & 0x0f
            c
          }
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case _ => () // APPn / COM / others: skip
      }
      pos += 2 + len
    }

    val hmax = scanComps.map(_.h).max; val vmax = scanComps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // T.81 A.2: a single-component scan is NON-interleaved — the MCU is
    // one data unit and the grid is exactly ceil(dim/8) at component
    // resolution, regardless of the frame's sampling factors.
    // Multi-component scans interleave MCU-padded h×v block clusters.
    val single = scanComps.length == 1
    val grids = scanComps.map { c =>
      val (gw, gh) =
        if (single) {
          val pw = (w * c.h + hmax - 1) / hmax
          val ph = (h * c.v + vmax - 1) / vmax
          ((pw + 7) / 8, (ph + 7) / 8)
        } else (mcusX * c.h, mcusY * c.v)
      (c, gw, gh, new Array[Array[Int]](gw * gh))
    }
    val in = new BitReader(bytes, pos)
    val dcPred = new Array[Int](scanComps.length)
    var rst = 0

    def decodeUnit(cIdx: Int, c: Component, q: Array[Int]): Array[Int] = {
      val coef = new Array[Int](64)
      val t = dcTabs(c.td).decode(in)
      dcPred(cIdx) += extend(in.receive(t), t)
      coef(0) = dcPred(cIdx) * q(0)
      var zi = 1
      while (zi < 64) {
        val rs = acTabs(c.ta).decode(in)
        val run = rs >> 4; val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) zi += 16 // ZRL
          else zi = 64 // EOB
        } else {
          zi += run
          require(zi < 64, s"AC run overflows the block (zi=$zi)")
          coef(Zigzag(zi)) = extend(in.receive(size), size) * q(Zigzag(zi))
          zi += 1
        }
      }
      coef
    }
    def maybeRestart(unitIdx: Int): Unit =
      if (restartInterval > 0 && unitIdx > 0 && unitIdx % restartInterval == 0) {
        in.restart(rst); rst = (rst + 1) % 8
        java.util.Arrays.fill(dcPred, 0)
      }

    if (single) {
      val (c, gw, gh, grid) = grids.head
      val q = quant(c.tq)
      require(q != null, s"missing quant table ${c.tq}")
      for (by <- 0 until gh; bx <- 0 until gw) {
        maybeRestart(by * gw + bx)
        grid(by * gw + bx) = decodeUnit(0, c, q)
      }
    } else {
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        maybeRestart(my * mcusX + mx)
        for (cIdx <- grids.indices) {
          val (c, gw, _, grid) = grids(cIdx)
          val q = quant(c.tq)
          require(q != null, s"missing quant table ${c.tq}")
          for (by <- 0 until c.v; bx <- 0 until c.h)
            grid((my * c.v + by) * gw + (mx * c.h + bx)) = decodeUnit(cIdx, c, q)
        }
      }
    }
    Coefficients(w, h, grids.map { case (c, _, _, g) => (c, g) }.toSeq,
      grids.map { case (_, gw, gh, _) => (gw, gh) }.toSeq)
  }

  /** Reconstruct one component plane at its own resolution. */
  private def reconstructPlane(coef: Array[Array[Int]], bw: Int, bh: Int,
                               pw: Int, ph: Int): Array[Byte] = {
    val plane = new Array[Byte](pw * ph)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val out = idct(coef(by * bw + bx).map(_.toDouble))
      for (y <- 0 until 8; x <- 0 until 8) {
        val px = bx * 8 + x; val py = by * 8 + y
        if (px < pw && py < ph) {
          val v = math.round(out(y * 8 + x) + 128.0)
          plane(py * pw + px) = math.max(0L, math.min(255L, v)).toByte
        }
      }
    }
    plane
  }

  /** Full baseline decode to RGB (grayscale replicated; YCbCr via the
    * JFIF inverse transform; subsampled chroma upsampled by replication).
    */
  def decodeJpeg(bytes: Array[Byte]): Rgb = {
    val Coefficients(w, h, comps, gridDims) = decodeCoefficients(bytes)
    val hmax = comps.map(_._1.h).max; val vmax = comps.map(_._1.v).max
    val planes = comps.zip(gridDims).map { case ((c, grid), (gw, gh)) =>
      val pw = (w * c.h + hmax - 1) / hmax; val ph = (h * c.v + vmax - 1) / vmax
      (c, pw, reconstructPlane(grid, gw, gh, pw, ph))
    }
    val out = new Array[Byte](w * h * 3)
    if (planes.length == 1) {
      val (_, pw, p) = planes.head
      for (y <- 0 until h; x <- 0 until w) {
        val v = p(y * pw + x)
        val i = (y * w + x) * 3
        out(i) = v; out(i + 1) = v; out(i + 2) = v
      }
    } else {
      require(planes.length == 3, s"unsupported component count ${planes.length}")
      val Seq((cy, ywd, yp), (cb, bwd, bp), (cr, rwd, rp)) = planes
      for (y <- 0 until h; x <- 0 until w) {
        val lum = yp((y * cy.v / vmax) * ywd + (x * cy.h / hmax)) & 0xff
        val cbv = (bp((y * cb.v / vmax) * bwd + (x * cb.h / hmax)) & 0xff) - 128
        val crv = (rp((y * cr.v / vmax) * rwd + (x * cr.h / hmax)) & 0xff) - 128
        def cl(v: Double): Byte = math.max(0L, math.min(255L, math.round(v))).toByte
        val i = (y * w + x) * 3
        out(i) = cl(lum + 1.402 * crv)
        out(i + 1) = cl(lum - 0.344136 * cbv - 0.714136 * crv)
        out(i + 2) = cl(lum + 1.772 * cbv)
      }
    }
    Rgb(w, h, out)
  }
}
