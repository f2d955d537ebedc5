package graft.schema

/** Core data model for the extraction engine.
  *
  * Mirrors the reference's interleaved text+media message parts
  * (/root/reference/crates/server/src/models.rs:117-124: `Text{text}` /
  * `ImageUrl{image_url}`) and its `image_token_ranges` span bookkeeping
  * (/root/reference/baselines/README.md:70-73): a document is an ordered
  * list of typed spans, some textual, some media references.
  *
  * Input table shape (authoritative, BASELINE.json `input_hint`):
  *   doc_id: string
  *   spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>
  */
final case class Span(
    kind: String,      // raw: "text" | "media" | "markup"
    text: String,      // raw text ("" for pure media spans)
    media_ref: String, // media identifier ("" for text spans)
    offset: Int        // source position; defines document order
)

final case class Doc(doc_id: String, spans: Seq[Span])

/** Raw-HTML document row — the [[Doc]] analog for the HTML front door
  * ([[graft.extract.Html]] tokenizes it into [[ExtractedSpan]]s).
  */
final case class HtmlDoc(doc_id: String, html: String)

/** Output span: extraction-assigned kind, cleaned text, propagated
  * media_ref, dense reading order (0..n-1 per doc).
  */
final case class ExtractedSpan(
    kind: String,      // "heading" | "paragraph" | "table" | "figure"
    text: String,
    media_ref: String,
    order: Int
)

final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[ExtractedSpan],
    markdown: String // rendered page (analog of result.mmd,
                     //   /root/reference/baselines/README.md:33-35)
)

/** Per-partition lineage manifest row (FIXTURES.md §4) — the analog of the
  * reference's bench JSON report (crates/cli/src/bench.rs:200-249).
  */
final case class PartitionManifest(
    partition_id: Int,
    doc_count: Long,
    span_count: Long,
    bytes: Long,
    wall_ms: Long,
    span_checksum: Long
)
