package graft.vision

/** Real GIF codec — the container the engine previously only
  * header-parsed (MediaOps.MediaHeaders.gif synthesizes the 13-byte
  * header; this decodes/encodes whole frames). Palette-indexed: encode
  * takes an index raster plus a 256-entry RGB palette and compresses
  * with GIF's variable-code-width LZW (min code size 8 → 9..12-bit
  * codes, CLEAR/EOI control codes, 4096-entry dictionary with reset on
  * overflow, LSB-first bit packing, ≤255-byte data sub-blocks); decode
  * inverts it, tolerating 87a/89a headers and skipping extension
  * blocks. Pure JVM, no codec jar — the GIF sibling of the PNG
  * Inflater path (PixelKernel.decodePng). Ref analog: the `image`
  * crate's GIF support behind image::open
  * (/root/reference/crates/cli/src/app.rs:95-101).
  *
  * The LZW algorithm is the public GIF87a specification (CompuServe,
  * 1987), appendix F — every step below is pinned by that spec.
  */
object GifKernel {

  /** Palette-indexed frame: `idx` row-major w×h palette indices,
    * `palette` 768 bytes of RGB triples.
    */
  final case class Indexed(w: Int, h: Int, idx: Array[Byte], palette: Array[Byte]) {
    require(palette.length == 768, s"palette must be 256 RGB entries")
    require(w > 0 && h > 0, s"raster must be non-empty, got ${w}x$h")
    require(idx.length == w * h, s"index raster must be w*h")
  }

  def toRgb(img: Indexed): PixelKernel.Rgb = {
    val data = new Array[Byte](img.w * img.h * 3)
    var i = 0
    while (i < img.idx.length) {
      val p = (img.idx(i) & 0xff) * 3
      data(i * 3) = img.palette(p)
      data(i * 3 + 1) = img.palette(p + 1)
      data(i * 3 + 2) = img.palette(p + 2)
      i += 1
    }
    PixelKernel.Rgb(img.w, img.h, data)
  }

  private val MinCodeSize = 8
  private val ClearCode = 1 << MinCodeSize // 256
  private val EoiCode = ClearCode + 1      // 257
  private val MaxDict = 4096

  /** GIF-variant LZW compress of the index stream. */
  private def lzwEncode(idx: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = MinCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // dictionary: (prefix code, next byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = EoiCode + 1
    emit(ClearCode)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val b = idx(i) & 0xff
      val key = (cur << 8) | b
      val hit = dict.get(key)
      if (hit != null) cur = hit
      else {
        emit(cur)
        if (nextCode < MaxDict) {
          dict.put(key, nextCode)
          nextCode += 1
          // The decoder learns each entry ONE CODE LATER than the
          // encoder creates it (it needs the next code's first byte),
          // so the encoder widens one entry after the power of two:
          // when nextCode passes (1<<codeSize)+1, the next emitted code
          // is the first one the decoder reads at the wider size.
          if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else {
          emit(ClearCode)
          dict = new java.util.HashMap[Integer, Integer]()
          nextCode = EoiCode + 1
          codeSize = MinCodeSize + 1
        }
        cur = b
      }
      i += 1
    }
    emit(cur)
    emit(EoiCode)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompress to exactly `n` indices. */
  private def lzwDecode(data: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var outPos = 0
    val prefix = new Array[Int](MaxDict)
    val suffix = new Array[Byte](MaxDict)
    var i = 0
    while (i < ClearCode) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    var nextCode = EoiCode + 1
    var codeSize = MinCodeSize + 1
    var bitBuf = 0L
    var bitCnt = 0
    var bytePos = 0
    var prev = -1
    val stack = new Array[Byte](MaxDict + 2)
    def firstByte(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }
    var done = false
    while (!done && outPos < n) {
      while (bitCnt < codeSize && bytePos < data.length) {
        bitBuf |= (data(bytePos) & 0xffL) << bitCnt
        bitCnt += 8
        bytePos += 1
      }
      if (bitCnt < codeSize) done = true
      else {
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize
        bitCnt -= codeSize
        if (code == ClearCode) {
          nextCode = EoiCode + 1
          codeSize = MinCodeSize + 1
          prev = -1
        } else if (code == EoiCode) done = true
        else {
          // expand `code` (or prev+first(prev) for the just-assigned case)
          var sp = 0
          var c = if (code == nextCode) { stack(sp) = firstByte(prev); sp += 1; prev }
                  else code
          require(c < nextCode, s"corrupt LZW stream: code $c >= $nextCode")
          // walk the prefix chain to the root (roots have prefix -1)
          while (c >= 0) {
            stack(sp) = suffix(c); sp += 1
            c = prefix(c)
          }
          while (sp > 0 && outPos < n) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
          if (prev >= 0 && nextCode < MaxDict) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstByte(code)
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    require(outPos == n, s"LZW stream ended at $outPos of $n indices")
    out
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode a single-frame GIF89a with a 256-entry global color table. */
  def encodeGif(img: Indexed): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(img.w)); out.write(le16(img.h))
    out.write(0xf7) // global table, 8-bit color res, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    out.write(img.palette)
    out.write(0x2c) // image descriptor
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(img.w)); out.write(le16(img.h))
    out.write(0) // no local table, not interlaced
    out.write(MinCodeSize)
    val lzw = lzwEncode(img.idx)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode a single-frame GIF (87a or 89a), skipping extensions. */
  def decodeGif(bytes: Array[Byte]): Indexed = {
    require(bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F', "not a GIF")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "global color table required")
    val tableSize = 2 << (packed & 0x07)
    var pos = 13
    val palette = new Array[Byte](768)
    System.arraycopy(bytes, pos, palette, 0, math.min(tableSize * 3, 768))
    pos += tableSize * 3
    // skip extension blocks (0x21 label, then length-prefixed sub-blocks)
    while ((bytes(pos) & 0xff) == 0x21) {
      pos += 2
      while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
      pos += 1
    }
    require((bytes(pos) & 0xff) == 0x2c, "image descriptor expected")
    val w = u16(pos + 5); val h = u16(pos + 7)
    // allocation sanity: corrupt descriptors must not request multi-GB
    // rasters (w*h can also overflow Int) — fail structured first
    require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024,
      s"implausible raster ${w}x$h")
    val localPacked = bytes(pos + 9) & 0xff
    pos += 10
    if ((localPacked & 0x80) != 0) pos += (2 << (localPacked & 0x07)) * 3
    val minCode = bytes(pos) & 0xff
    require(minCode == MinCodeSize, s"unsupported min code size $minCode")
    pos += 1
    val lzw = new java.io.ByteArrayOutputStream()
    var len = bytes(pos) & 0xff
    while (len != 0) {
      lzw.write(bytes, pos + 1, len)
      pos += 1 + len
      len = bytes(pos) & 0xff
    }
    Indexed(w, h, lzwDecode(lzw.toByteArray, w * h), palette)
  }
}
