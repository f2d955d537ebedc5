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

  def docIdStr(id: Long): String = f"d$id%010d"

  /** Pure derivation of one interleaved doc from a flat document row. */
  def deriveDoc(id: Long, text: String): Doc = {
    val words = text.split(" ").filter(_.nonEmpty)
    val b = Seq.newBuilder[Span]
    val head = words.take(3).mkString(" ")
    b += Span("text", s"# $head\r\n${graft.extract.Kernel.EosSentinel}", "", 0)
    b += Span("markup", "[home] [about] [contact] nav menu", "", 10)
    val body = words.drop(3)
    body.grouped(ParagraphChunk).zipWithIndex.foreach { case (chunk, i) =>
      b += Span("text", chunk.mkString(" "), "", 100 + 100 * i)
    }
    if (id % 3 == 0)
      b += Span("markup", s"| k | v |\n| r$id | c$id |", "", 5000)
    if (id % 2 == 0)
      b += Span("media", "", s"img://$id/0", 6000)
    if (id % 4 == 0)
      b += Span("media", "", s"img://$id/1", 6001)
    b += Span("markup", "footer copyright [privacy] [terms] [cookies]", "", 9000)
    val spans = b.result()
    // rotate array order by doc_id so input order != reading order
    val rot = (id % spans.size).toInt
    Doc(docIdStr(id), spans.drop(rot) ++ spans.take(rot))
  }

  /** documents.parquet → Dataset[Doc]; narrow map, scales with the scan. */
  def derive(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => deriveDoc(id, text) }
  }
}
