package graft

import graft.extract.Kernel
import graft.schema.{Doc, Span}

/** Golden-fixture capture (analog of the reference's
  * scripts/capture_baseline.py discipline: capture → human-review → freeze,
  * /root/reference/baselines/README.md:6-9). Run manually with
  *   sbt "Test/runMain graft.GoldenGen"
  * then review the JSON and copy into src/test/resources/golden/fixtures.json.
  */
object GoldenGen {

  /** Handcrafted input docs covering: normalize (CRLF+EOS), boilerplate
    * strip (nav/footer/link-density), table detection, figures w/ and w/o
    * caption text, '#'-without-space fallback, offset tie-break by array
    * index, scrambled array order, and an all-boilerplate doc.
    */
  val goldenInputs: Seq[Doc] = Seq(
    Doc("g1", Seq(
      Span("markup", "footer copyright [privacy] [terms]", "", 900),
      Span("text", s"# Title One\r\n${Kernel.EosSentinel}", "", 0),
      Span("text", "Second paragraph body text.", "", 200),
      Span("media", "", "img://g1/0", 150),
      Span("text", "First paragraph.", "", 100),
      Span("markup", "[home] [about] nav", "", 10)
    )),
    Doc("g2", Seq(
      Span("markup", "| a | b |\n| 1 | 2 |", "", 50),
      Span("text", "####NoSpace heading-ish", "", 20),
      Span("text", "## Sub head", "", 20),
      Span("markup", "plain markup, neither table nor links", "", 60),
      Span("text", "   \r\n  ", "", 70),
      Span("media", "A caption", "img://g2/9", 80)
    )),
    Doc("g3", Seq(
      Span("markup", "[home] [about] [contact]", "", 0),
      Span("markup", "Subscribe to our newsletter now", "", 5),
      Span("markup", "footer copyright", "", 10)
    ))
  )

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val recs = goldenInputs.map { doc =>
      val e = Kernel.extract(doc)
      val in = doc.spans.map(s =>
        s"""{"kind":${q(s.kind)},"text":${q(s.text)},"media_ref":${q(s.media_ref)},"offset":${s.offset}}""")
        .mkString("[", ",", "]")
      val out = e.spans.map(s =>
        s"""{"kind":${q(s.kind)},"text":${q(s.text)},"media_ref":${q(s.media_ref)},"order":${s.order}}""")
        .mkString("[", ",", "]")
      s"""{"schema_version":1,"doc_id":${q(doc.doc_id)},"input_spans":$in,"expected_spans":$out,"expected_markdown":${q(e.markdown)}}"""
    }
    val content = recs.mkString("\n") + "\n"
    if (args.nonEmpty) {
      java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote ${recs.size} fixtures to ${args(0)}")
    } else println(content)
  }
}
