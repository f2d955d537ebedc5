package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Html
import graft.extract.Html.Block

class HtmlSpec extends AnyFunSuite {

  test("block segmentation, headings, tables, figures") {
    val h = "<h2>Title A</h2><p>body one</p>" +
      "<table><tr><td>c1</td><td>c2</td></tr></table>" +
      "<figure><img src=\"x.png\" alt=\"pic\"/></figure>"
    assert(Html.extract(h) == Vector(
      Block("heading", "Title A", "", 0, 2),
      Block("paragraph", "body one", "", 0, 0),
      Block("table", "c1", "", 0, 0),
      Block("table", "c2", "", 0, 0),
      Block("figure", "pic", "x.png", 0, 0)))
  }

  test("raw-text skip: script/style/title content never leaks, fake closers inside strings") {
    val h = "<head><title>T <p>x</p></title><style>p>a{c:red}</style></head>" +
      "<body><script>if(a<b&&c>d){w(\"</div><p>no</p>\")}</script><p>real</p></body>"
    assert(Html.extract(h) == Vector(Block("paragraph", "real", "", 0, 0)))
  }

  test("case-insensitive tags and raw-text closers") {
    val h = "<SCRIPT>x<y</ScRiPt><H3>up</H3><P>t</P>"
    assert(Html.extract(h) == Vector(
      Block("heading", "up", "", 0, 3), Block("paragraph", "t", "", 0, 0)))
  }

  test("comments containing markup are skipped; unterminated comment eats the tail") {
    assert(Html.extract("<p>a</p><!-- <p>b</p> --><p>c</p>") ==
      Vector(Block("paragraph", "a", "", 0, 0), Block("paragraph", "c", "", 0, 0)))
    assert(Html.extract("<p>a</p><!-- open <p>never</p>") ==
      Vector(Block("paragraph", "a", "", 0, 0)))
  }

  test("quoted attribute values may contain '>'") {
    val h = "<div data-q=\"x>y\" title='a>b'>kept</div>"
    assert(Html.extract(h) == Vector(Block("paragraph", "kept", "", 0, 0)))
  }

  test("entities: named, decimal, hex, nbsp; unknown and unterminated degrade to literal &") {
    val h = "<p>A&amp;B &lt;tag&gt; &quot;q&quot; &#65;&#x42; &nbsp;sp &copy; &amp no-semi</p>"
    val Vector(b) = Html.extract(h)
    assert(b.text == "A&B <tag> \"q\" AB sp &copy; &amp no-semi")
  }

  test("entities decode inside attribute values") {
    val h = "<figure><img src=\"a&amp;b.png\" alt=\"x &lt; y\"/></figure>"
    assert(Html.extract(h) == Vector(Block("figure", "x < y", "a&b.png", 0, 0)))
  }

  test("whitespace collapse and br-as-space, hr as block break") {
    val h = "<p>one\n\t  two<br>three</p><p>x</p><hr><p>y</p>"
    assert(Html.extract(h).map(_.text) == Vector("one two three", "x", "y"))
  }

  test("link density: >= 0.5 dropped, < 0.5 kept with den_milli") {
    // link chars 6 ("a0a1a2"? no: collapsed per segment "a0","a1","a2" = 6),
    // text "a0 a1 a2 m" = 10 chars -> 600 -> dropped
    val farm = "<div><a href=\"#\">a0</a> <a href=\"#\">a1</a> <a href=\"#\">a2</a> m</div>"
    assert(Html.extract(farm).isEmpty)
    // "see LINK tail" 13 chars, link 4 -> 307
    val ok = "<p>see <a href=\"u\">LINK</a> tail</p>"
    assert(Html.extract(ok) == Vector(Block("paragraph", "see LINK tail", "", 307, 0)))
    // exact boundary: "ab cd" 5 chars? link "ab" 2 -> 400 kept; "abc de" link "abc" 3/6=500 dropped
    assert(Html.extract("<p><a href=\"#\">abc</a> de</p>").isEmpty)
    assert(Html.extract("<p><a href=\"#\">ab</a> cd</p>").nonEmpty)
  }

  test("nav/footer/aside/head ancestor contexts drop all inner blocks, nested included") {
    val h = "<nav><p>n1</p><div><p>n2</p></div></nav><p>keep</p>" +
      "<footer>f</footer><aside><h1>ad</h1></aside>"
    assert(Html.extract(h) == Vector(Block("paragraph", "keep", "", 0, 0)))
  }

  test("anchor spanning a block boundary still counts link chars per block") {
    val h = "<div><a href=\"#\">ab<p>cd efgh</p></a></div>"
    // block 1: text "ab" all link (1000) dropped; block 2: "cd efgh" link "cd efgh"(7)/7 -> dropped
    assert(Html.extract(h).isEmpty)
  }

  test("stray '<' is literal text; unclosed tag at EOF flushes") {
    val h = "<p>1 < 2 and 3>2</p><p>tail"
    assert(Html.extract(h).map(_.text) == Vector("1 < 2 and 3>2", "tail"))
  }

  test("img without figure attaches to the enclosing block; first src wins") {
    val h = "<p>intro <img src=\"a.png\"/> <img src=\"b.png\"/> out</p>"
    assert(Html.extract(h) == Vector(Block("figure", "intro out", "a.png", 0, 0)))
  }

  test("fuzz: arbitrary garbage never throws and always terminates") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val fragment = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("<", ">", "</", "<!--", "-->", "&", "&#", "&amp;", ";", "\"",
        "'", "=", "/", "<p", "<p>", "</p>", "<script>", "</script>",
        "<a href=", "<img src=\"", "<!doctype", "<div data-x=\"a>b\">"),
      Gen.listOf(Gen.choose(' ', 'ÿ')).map(_.mkString))
    val doc = Gen.listOfN(24, fragment).map(_.mkString)
    val prop = Prop.forAll(doc) { s =>
      val out = Html.extract(s) // must not throw, must not hang
      out.forall(b => b.kind.nonEmpty && b.denMilli >= 0)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("raw-text closer requires a name boundary: </scripts> does not close <script>") {
    val h = "<p>a</p><script>x</scripts>y</script><p>b</p>"
    assert(Html.extract(h).map(_.text) == Vector("a", "b"))
  }

  test("numeric entities decode in attribute values; surrogate refs degrade to literal") {
    val h = "<figure><img src=\"a&#47;b.png\"/></figure>"
    assert(Html.extract(h) == Vector(Block("figure", "", "a/b.png", 0, 0)))
    val Vector(s) = Html.extract("<p>x &#55296; y</p>")
    assert(s.text == "x &#55296; y") // lone UTF-16 surrogate rejected
  }

  test("synthesize -> extract inverts the closed-form rule") {
    for (id <- (0L until 40L) ++
         Seq(9999999L, 10000000L, 987654321L, 123456789012345678L)) {
      val got = Html.extract(Html.synthesize(id))
      val want = Vector.newBuilder[Block]
      (0 until Html.blockCount(id)).foreach { i =>
        Html.blockKind(id, i) match {
          case 0 => want += Block("heading", s"h${id}_$i A&B", "", 0, Html.hLevel(id, i))
          case 1 => want += Block("paragraph", s"p${id}_$i x!", "", 0, 0)
          case 2 =>
            val link = s"L${id}_$i"
            val text = s"see $link t$i of ordinary running prose end"
            want += Block("paragraph", text, "", 1000L * link.length / text.length, 0)
          case 3 | 4 => // dropped: link farm / nav context
          case 5 => want += Block("figure", s"fig $i", s"images/${id}_$i.png", 0, 0)
          case _ =>
            want += Block("table", s"c${id}_${i}_0", "", 0, 0)
            want += Block("table", s"c${id}_${i}_1", "", 0, 0)
        }
      }
      assert(got == want.result(), s"doc $id")
    }
  }
}
