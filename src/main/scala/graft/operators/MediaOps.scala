package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video handled as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted by
  * per-partition kernels.
  *
  * The DECODE step is a deliberate STUB (no image/audio codecs ship in
  * this container): `decodeStub` derives deterministic fake metadata from
  * the content bytes. Everything AROUND the stub is real and is what
  * matters at 100 TB — the binary column schema, the typed Dataset
  * encoder for byte arrays, per-partition batched iteration (one kernel
  * instance per partition, matching the reference's batched tile
  * processing, /root/reference/crates/core/src/model/mod.rs:1197-1220),
  * and the narrow no-shuffle plan shape.
  *
  * To swap in a real decoder: replace the body of [[MediaKernel.decode]]
  * with the codec call; the pipeline, schema, and tests stay unchanged.
  */
object MediaOps {

  final case class MediaItem(doc_id: Long, media_ref: String, content: Array[Byte])
  final case class MediaMeta(media_ref: String, width: Long, height: Long,
                             format: String, n_bytes: Long)

  /** Derive the media-item table from `documents` (the same %2 / %4 rule
    * as the corpus derivation — CorpusDerive) with the payload bytes
    * synthesized as unhex(md5(media_ref)) (16 deterministic bytes).
    * Narrow, codegen'd; real pipelines read these bytes from the lake.
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
    refs.withColumn("content", unhex(md5(col("media_ref"))))
      .as[MediaItem]
  }

  object MediaKernel {
    /** STUB decode ??? — stands in for image decode (PNG/JPEG header
      * parse). Deterministic metadata from the media_ref hash; replace
      * with a real codec where available. Width/height/format mirror what
      * a header sniff would produce.
      */
    def decode(item: MediaItem): MediaMeta = {
      val w = Hashing.md5i(s"w|${item.media_ref}") % 1920L + 1L
      val h = Hashing.md5i(s"h|${item.media_ref}") % 1080L + 1L
      val fmt = (Hashing.md5i(s"t|${item.media_ref}") % 3L) match {
        case 0L => "jpeg"
        case 1L => "png"
        case _  => "webp"
      }
      MediaMeta(item.media_ref, w, h, fmt, item.content.length.toLong)
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
}
