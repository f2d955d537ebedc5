package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video handled as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted by
  * per-partition kernels.
  *
  * The decode step is a REAL container-header parse: [[MediaKernel.decode]]
  * sniffs the magic bytes and reads the dimensions out of the PNG IHDR
  * chunk, the JPEG SOF frame header (found by walking the marker
  * segments), or the GIF logical-screen descriptor — the same front door
  * as the reference's `image::open` file scan
  * (/root/reference/crates/cli/src/app.rs:95-101; Cargo.toml:12). Full
  * pixel decode (inflate/IDCT) is out of scope — no codec jar ships in
  * this container, and the extraction pipeline needs dimensions and
  * format, not pixels. [[mediaItems]] SYNTHESIZES spec-conformant
  * headers (real signatures, big/little-endian dims, a real CRC32 on the
  * PNG IHDR), so the parser exercises the true byte paths and the DuckDB
  * oracle can recompute expected dims from the same derivation rule.
  *
  * Scale shape: the binary column schema, typed Dataset encoder for byte
  * arrays, per-partition batched iteration (one kernel instance per
  * partition, matching the reference's batched tile processing,
  * /root/reference/crates/core/src/model/mod.rs:1197-1220), and the
  * narrow no-shuffle plan are what matter at 100 TB.
  */
object MediaOps {

  final case class MediaItem(doc_id: Long, media_ref: String, content: Array[Byte])
  final case class MediaMeta(media_ref: String, width: Long, height: Long,
                             format: String, n_bytes: Long)

  /** Spec-conformant minimal container headers. Byte layouts follow the
    * published specs (PNG RFC 2083 §3; JPEG ITU-T T.81 B.2; GIF89a §18).
    */
  object MediaHeaders {
    val PngLen = 33   // 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
    val JpegLen = 41  // SOI + APP0(18) + SOF0(19) + EOI
    val GifLen = 13   // "GIF89a" + logical screen descriptor

    private def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

    /** PNG signature + IHDR chunk (bit depth 8, truecolor, real CRC32). */
    def png(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val typeAndData = "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 2, 0, 0, 0)
      val crc = new java.util.zip.CRC32
      crc.update(typeAndData)
      sig ++ be32(13) ++ typeAndData ++ be32(crc.getValue.toInt)
    }

    /** JPEG SOI + JFIF APP0 + baseline SOF0 (3 components) + EOI. */
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val soi = Array(0xff, 0xd8).map(_.toByte)
      val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      val eoi = Array(0xff, 0xd9).map(_.toByte)
      soi ++ app0 ++ sof0 ++ eoi
    }

    /** GIF89a header + logical screen descriptor (LE dims). */
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0, 0, 0)
  }

  /** Derive the media-item table from `documents` (the same %2 / %4 rule
    * as the corpus derivation — CorpusDerive). Dims/format derive from the
    * media_ref hash and are ENCODED into a real container header; real
    * pipelines read these bytes from the lake. Narrow per-row map.
    */
  def mediaItems(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    val id = col("doc_id").cast("string")
    val ref0 = concat(lit("img://"), id, lit("/0"))
    val ref1 = concat(lit("img://"), id, lit("/1"))
    val refs = docs.select(col("doc_id"),
      explode(
        when(col("doc_id") % 4 === 0, array(ref0, ref1))
          .when(col("doc_id") % 2 === 0, array(ref0))
          .otherwise(array().cast("array<string>"))).as("media_ref"))
    refs.as[(Long, String)].map { case (docId, ref) =>
      val w = (Hashing.md5i(s"w|$ref") % 1920L + 1L).toInt
      val h = (Hashing.md5i(s"h|$ref") % 1080L + 1L).toInt
      val content = (Hashing.md5i(s"t|$ref") % 3L) match {
        case 0L => MediaHeaders.jpeg(w, h)
        case 1L => MediaHeaders.png(w, h)
        case _  => MediaHeaders.gif(w, h)
      }
      MediaItem(docId, ref, content)
    }
  }

  object MediaKernel {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be16(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 8) | (b(i + 1) & 0xffL)
    private def le16(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)

    private val PngSig =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Header sniff + dimension parse from the CONTENT BYTES: PNG IHDR
      * (big-endian u32 at fixed chunk offsets), JPEG SOF0-3 (marker walk
      * skipping segment lengths), GIF logical screen (little-endian u16).
      * Unknown containers yield ("unknown", 0×0) — never an exception;
      * corrupt rows must not kill a 100 TB scan task.
      */
    def decode(item: MediaItem): MediaMeta = {
      val b = item.content
      val n = b.length.toLong
      if (b.length >= 24 && b.startsWith(PngSig) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        MediaMeta(item.media_ref, be32(b, 16), be32(b, 20), "png", n)
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // marker walk to the first SOF frame header (C0-C3: baseline,
        // extended, progressive, lossless)
        var i = 2
        var out: MediaMeta = MediaMeta(item.media_ref, 0, 0, "unknown", n)
        var done = false
        while (!done && i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) done = true
          else {
            val m = b(i + 1) & 0xff
            if (m >= 0xc0 && m <= 0xc3) {
              if (i + 8 < b.length)
                out = MediaMeta(item.media_ref, be16(b, i + 7), be16(b, i + 5),
                  "jpeg", n)
              done = true
            } else if (m == 0xd9 || (m >= 0xd0 && m <= 0xd8) || m == 0x01) i += 2
            else i += 2 + be16(b, i + 2).toInt
          }
        }
        out
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
        MediaMeta(item.media_ref, le16(b, 6), le16(b, 8), "gif", n)
      else MediaMeta(item.media_ref, 0, 0, "unknown", n)
    }
  }

  /** Decode metadata for every media item — per-partition batched kernel
    * (the mapInPandas-batch analog in typed Scala).
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaItems(spark, docs).mapPartitions(_.map(MediaKernel.decode))
  }

  /** Frame sampling: each media item has n_frames = md5i("f|ref")%96+5
    * (a stub for container metadata), sampled every 10th frame.
    * Output (media_ref, frame_idx) — codegen'd sequence+explode.
    */
  def frameSample(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaItems(spark, docs).toDF()
      .withColumn("n_frames", Hashing.md5iCol(concat(lit("f|"), col("media_ref"))) % 96L + 5L)
      .select(col("media_ref"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(10L))).as("frame_idx"))
  }

  /** S3's base64 half — the data-URL media front door. The reference's
    * API path accepts ONLY `data:…;base64,` image URLs and rejects local
    * paths / other schemes (/root/reference/crates/server/src/
    * generation.rs:262-304). Here each media item is rendered as
    * `data:image/<fmt>;base64,<bytes>` (a deterministic subset is rendered
    * as a rejected `file://` ref instead), then decoded back with the
    * codegen'd `unbase64` and header-parsed by [[MediaKernel.decode]] —
    * so base64 encode/decode is load-bearing: if it corrupted a byte, the
    * parsed dimensions would hash-mismatch. Rejected schemes degrade to
    * ("rejected", 0×0, 0 bytes) rows, never an exception.
    */
  def dataUrlDecode(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val tHash = Hashing.md5iCol(concat(lit("t|"), col("media_ref"))) % 3L
    val fmt = when(tHash === 0L, "jpeg").when(tHash === 1L, "png")
      .otherwise("gif")
    val rejected =
      Hashing.md5iCol(concat(lit("rej|"), col("media_ref"))) % 5L === 0L
    val urls = mediaItems(spark, docs).toDF()
      .select(col("media_ref"),
        when(rejected, concat(lit("file:///lake/"), col("media_ref")))
          .otherwise(concat(lit("data:image/"), fmt, lit(";base64,"),
            base64(col("content")))).as("url"))
    // accept/reject + unbase64 stay codegen'd; only the header parse
    // drops to the kernel (null bytes = rejected scheme)
    urls.select(col("media_ref"),
        when(col("url").startsWith("data:image/") &&
             col("url").contains(";base64,"),
          unbase64(substring_index(col("url"), ";base64,", -1))).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (ref, bytes) =>
        if (bytes == null) MediaMeta(ref, 0L, 0L, "rejected", 0L)
        else MediaKernel.decode(MediaItem(0L, ref, bytes))
      })
      .toDF()
  }

  /** File name for a media item when materialized to a lake directory
    * ("img://123/0" → "m123_0.jpg"), and the inverse. The binaryFile
    * source round-trip (S1) uses these.
    */
  def fileName(item: MediaItem): String = {
    val ext = (Hashing.md5i(s"t|${item.media_ref}") % 3L) match {
      case 0L => "jpg"; case 1L => "png"; case _ => "gif"
    }
    val core = item.media_ref.stripPrefix("img://").replace('/', '_')
    s"m$core.$ext"
  }

  def refOfFileName(name: String): String = {
    val core = name.stripPrefix("m").replaceAll("\\.[a-z]+$", "")
    val Array(id, slot) = core.split('_')
    s"img://$id/$slot"
  }

  /** Materialize media items as individual files (executor-side
    * foreachPartition write — no driver collect), scan them back with the
    * `binaryFile` DataSource, and decode headers from the scanned bytes:
    * the S1 source path end-to-end.
    */
  def binaryFileRoundTrip(spark: SparkSession, docs: DataFrame,
                          dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    mediaItems(spark, docs).foreachPartition { it: Iterator[MediaItem] =>
      it.foreach { item =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, fileName(item)), item.content)
      }
    }
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, content) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        MediaKernel.decode(MediaItem(0L, refOfFileName(name), content))
      }
  }
}
