package graft.corpus

import graft.schema.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic interleaved-document corpus, derived row-for-row from the
  * driver-generated `documents.parquet` (TESTDATA.md, seed 42) by pure
  * SQL-reproducible rules — no randomness, no external data. This stands in
  * for the 10^12-doc Iceberg corpus at test scale; the derivation is a
  * narrow map (no shuffle) so it scales with the source table.
  *
  * The rules are deliberately simple enough that a DuckDB oracle can
  * recompute aggregate properties of the *extracted* output directly from
  * `documents.parquet` (see SparkEntry.oracleSql), giving the driver's
  * correctness gate end-to-end leverage over the whole pipeline.
  *
  * Per-doc layout (offsets define true reading order; the span ARRAY is
  * rotated by doc_id so the kernel's reading-order recovery is exercised):
  *
  *   offset 0     heading  "# w0 w1 w2"  (+ CRLF & EOS sentinel noise that
  *                                         normalizeText must strip)
  *   offset 10    nav boilerplate (markup, link-density ≥ 0.5)
  *   offset 100+  paragraphs: words[3..] in chunks of 12
  *   offset 5000  table (markup, '|' grid)            iff doc_id % 3 == 0
  *   offset 6000  figure media_ref img://{id}/0        iff doc_id % 2 == 0
  *   offset 6001  figure media_ref img://{id}/1        iff doc_id % 4 == 0
  *   offset 9000  footer boilerplate (markup)
  */
object CorpusDerive {

  final case class DocumentRow(doc_id: Long, text: String, lang: String,
                               source: String, n_chars: Long)

  val ParagraphChunk = 12

  /** "d%010d" without String.format (which dominates profile at 16M+
    * docs/run in the bench amplification).
    */
  def docIdStr(id: Long): String = {
    val s = java.lang.Long.toString(id)
    val sb = new java.lang.StringBuilder(11)
    sb.append('d')
    var i = s.length
    while (i < 10) { sb.append('0'); i += 1 }
    sb.append(s)
    sb.toString
  }

  /** Space-join of words[from, until) without intermediate slices. */
  private def joinRange(ws: Array[String], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < until) {
      if (i > from) sb.append(' ')
      sb.append(ws(i))
      i += 1
    }
    sb.toString
  }

  /** Pure derivation of one interleaved doc from a flat document row.
    * (Hot path at bench amplification: single-char split takes the JDK
    * no-regex fast path; paragraph chunks join by index range; the
    * reading-order rotation is one array copy.)
    */
  def deriveDoc(id: Long, text: String): Doc = {
    val words = text.split(" ").filter(_.nonEmpty)
    val nPara = math.max(0, words.length - 3 + ParagraphChunk - 1) / ParagraphChunk
    val spans = new Array[Span](2 + nPara +
      (if (id % 3 == 0) 1 else 0) + (if (id % 2 == 0) 1 else 0) +
      (if (id % 4 == 0) 1 else 0) + 1)
    var n = 0
    spans(n) = Span("text",
      s"# ${joinRange(words, 0, math.min(3, words.length))}\r\n${graft.extract.Kernel.EosSentinel}",
      "", 0); n += 1
    spans(n) = Span("markup", "[home] [about] [contact] nav menu", "", 10); n += 1
    var p = 0
    while (p < nPara) {
      val from = 3 + p * ParagraphChunk
      spans(n) = Span("text",
        joinRange(words, from, math.min(from + ParagraphChunk, words.length)),
        "", 100 + 100 * p)
      n += 1; p += 1
    }
    if (id % 3 == 0) {
      spans(n) = Span("markup", s"| k | v |\n| r$id | c$id |", "", 5000); n += 1
    }
    if (id % 2 == 0) {
      spans(n) = Span("media", "", s"img://$id/0", 6000); n += 1
    }
    if (id % 4 == 0) {
      spans(n) = Span("media", "", s"img://$id/1", 6001); n += 1
    }
    spans(n) = Span("markup", "footer copyright [privacy] [terms] [cookies]", "", 9000)
    n += 1
    // rotate array order by doc_id so input order != reading order
    val rot = (id % n).toInt
    val rotated = new Array[Span](n)
    System.arraycopy(spans, rot, rotated, 0, n - rot)
    System.arraycopy(spans, 0, rotated, n - rot, rot)
    Doc(docIdStr(id), scala.collection.immutable.ArraySeq.unsafeWrapArray(rotated))
  }

  /** documents.parquet → Dataset[Doc]; narrow map, scales with the scan. */
  def derive(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => deriveDoc(id, text) }
  }
}
