package graft.operators

import graft.functions.Hashing
import graft.schema.Doc
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Token-stream construction + positional merge — the Spark analog of the
  * reference's prompt pipeline:
  *
  *  - segment split / per-segment tokenize / placeholder synthesis
  *    (/root/reference/crates/core/src/inference.rs:107-175: text
  *    segments tokenized with mask 0; each `<image>` slot expands to its
  *    placeholder tokens with mask 1; slot count must equal image count)
  *  - the masked scatter join (/root/reference/crates/core/src/model/
  *    mod.rs:1222-1320: replace rows at mask positions with image rows,
  *    in order, exact arity)
  *
  * All per-doc (spans never leave their row) → narrow kernel, no shuffle.
  * Non-crop placeholder count: g = ceil((640/16)/4) = 10 → 10·11+1 = 111
  * tokens per image (inference.rs:226-239 non-crop branch).
  */
object TokenOps {

  val ImageTokenId: Long = -1L
  /** Non-crop placeholder tokens per image slot: (g+1)·g + 1, g=10. */
  val TokensPerImage: Int = {
    val g = (TilingOps.ImageSize / TilingOps.PatchSize + TilingOps.DownsampleRatio - 1) /
      TilingOps.DownsampleRatio
    g * (g + 1) + 1
  }

  final case class TokenStream(ids: Array[Long], mask: Array[Boolean]) {
    def maskOnes: Int = mask.count(identity)
  }

  /** Build the interleaved token stream for one raw doc: spans in offset
    * order; text spans → word-hash ids (mask 0), media spans →
    * TokensPerImage placeholder ids (mask 1).
    */
  def buildTokenStream(doc: Doc): TokenStream = {
    val ids = Array.newBuilder[Long]
    val mask = Array.newBuilder[Boolean]
    doc.spans.sortBy(_.offset).foreach { s =>
      if (s.kind == "media" || s.media_ref.nonEmpty) {
        var i = 0
        while (i < TokensPerImage) { ids += ImageTokenId; mask += true; i += 1 }
      } else {
        s.text.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
          ids += Hashing.md5i(w); mask += false
        }
      }
    }
    TokenStream(ids.result(), mask.result())
  }

  /** Masked scatter: replace ids at mask positions with `repl` in order.
    * Exact-arity contract like the reference's inject (mod.rs:1259-1266:
    * "image token count mismatch" is an error, never a truncation).
    */
  def injectAtMask(ids: Array[Long], mask: Array[Boolean],
                   repl: Seq[Long]): Array[Long] = {
    require(ids.length == mask.length, "ids/mask length mismatch")
    val n = mask.count(identity)
    require(repl.length == n,
      s"replacement count ${repl.length} does not match mask positions $n")
    val out = ids.clone()
    var j = 0
    var i = 0
    while (i < out.length) {
      if (mask(i)) { out(i) = repl(j); j += 1 }
      i += 1
    }
    out
  }

  /** P6: token-id validity filter — the reference keeps only ids
    * convertible to u32 before decoding them back to text
    * (/root/reference/crates/cli/src/app.rs:155-158,190-194; ids outside
    * u32 are silently dropped, never an error).
    */
  val MaxU32 = 4294967296L
  def validTokenFilter(ids: Array[Long]): Array[Long] =
    ids.filter(id => id >= 0L && id < MaxU32)

  /** Driver query for P6: token stream per doc (one text span + its
    * media slots), validity-filtered. Word-hash ids are 60-bit, so valid
    * u32 ids are the ~2^-28 tail; placeholder ids (-1) are always
    * dropped. Output (doc_id, n_ids, n_valid_u32, n_dropped).
    */
  def tokenValidity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val slots = (if (id % 2 == 0) 1 else 0) + (if (id % 4 == 0) 1 else 0)
        val spans = graft.schema.Span("text", text, "", 0) +:
          (0 until slots).map(i =>
            graft.schema.Span("media", "", s"img://$id/$i", 1 + i))
        val ts = buildTokenStream(Doc(graft.corpus.CorpusDerive.docIdStr(id), spans))
        val valid = validTokenFilter(ts.ids)
        (id, ts.ids.length.toLong, valid.length.toLong,
          (ts.ids.length - valid.length).toLong)
      }.toDF("doc_id", "n_ids", "n_valid_u32", "n_dropped")
  }

  /** S6: broadcast-dictionary tokenizer — the Spark shape of the
    * reference's tokenizer.json load (cli/app.rs:80-85): a bounded
    * vocabulary resolved once on the driver (the tokenizer-file analog),
    * broadcast to every task, and applied as a per-row map. Vocab = the
    * corpus's top-`k` words by frequency (ties by word, rank = id);
    * out-of-vocabulary words map to id `k` (a single OOV bucket, like an
    * <unk> token).
    */
  val DictSize = 16

  /** Top-k (word → id) vocabulary. The driver collect is BOUNDED by k —
    * this is dictionary loading, not data collection.
    */
  def buildVocab(docs: DataFrame, k: Int = DictSize): Map[String, Long] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"word")
      .limit(k)
      .select($"word").as[String].collect()
      .zipWithIndex.map { case (w, i) => w -> i.toLong }.toMap
  }

  /** Per-doc dictionary tokenization stats: token count, OOV count, and
    * an order-sensitive fingerprint of the id sequence (so the oracle
    * verifies the exact ids in exact order, not just counts).
    */
  def dictTokenize(spark: SparkSession, docs: DataFrame,
                   k: Int = DictSize): DataFrame = {
    import spark.implicits._
    val vocab = spark.sparkContext.broadcast(buildVocab(docs, k))
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val ws = text.split(" ")
      var oov = 0L
      var fp = 0L
      var i = 0
      while (i < ws.length) {
        val tid = vocab.value.getOrElse(ws(i), k.toLong)
        if (tid == k.toLong) oov += 1
        fp = (fp * 31 + tid) % Hashing.FpMod
        i += 1
      }
      (id, ws.length.toLong, oov, fp)
    }.toDF("doc_id", "n_tokens", "n_oov", "fp")
  }

  /** Inverse-vocabulary decode round trip — the reference detokenizes ids
    * back to text before display (/root/reference/crates/cli/src/
    * app.rs:155-190); this is the encode→decode fidelity surface. Each
    * doc's words encode through the broadcast vocab and decode through
    * its inverse (OOV bucket id → the `<unk>` sentinel, which is what the
    * round trip LOSES — in-vocab words decode back to themselves exactly
    * because the vocab is a bijection). Output per doc: token count,
    * recovered-word count, whether decode(encode(text)) == text, and an
    * md5 digest of the decoded text the oracle recomputes.
    */
  val UnkToken = "<unk>"
  def dictRoundTrip(spark: SparkSession, docs: DataFrame,
                    k: Int = DictSize): DataFrame = {
    import spark.implicits._
    val vocab = spark.sparkContext.broadcast(buildVocab(docs, k))
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        val v = vocab.value
        val inv: Map[Long, String] = v.map(_.swap)
        it.map { case (id, text) =>
          val ws = text.split(" ")
          var rec = 0L
          val decoded = new Array[String](ws.length)
          var i = 0
          while (i < ws.length) {
            val tid = v.getOrElse(ws(i), k.toLong)
            if (tid == k.toLong) decoded(i) = UnkToken
            else { decoded(i) = inv(tid); rec += 1 }
            i += 1
          }
          val dec = decoded.mkString(" ")
          (id, ws.length.toLong, rec, if (dec == text) 1L else 0L,
            Hashing.md5hex(dec))
        }
      }.toDF("doc_id", "n_tokens", "n_recovered", "exact", "digest")
  }

  /** Per-doc token accounting over the derived corpus — the A2 invariant
    * surface (mask ones == vision_token_total, inference.rs:163-172).
    */
  def tokenAccounting(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.corpus.CorpusDerive.derive(spark, sfDir).map { doc =>
      val ts = buildTokenStream(doc)
      val slots = doc.spans.count(s => s.kind == "media" || s.media_ref.nonEmpty)
      (doc.doc_id, ts.ids.length.toLong, slots.toLong, ts.maskOnes.toLong,
        slots.toLong * TokensPerImage)
    }.toDF("doc_id", "n_tokens", "n_image_slots", "n_mask_ones",
           "vision_token_total")
  }
}
