package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Grounding
import graft.extract.Grounding.Ref

class GroundingSpec extends AnyFunSuite {

  test("hand-written markup: refs, multi-box dets, image numbering") {
    val s = "intro <|ref|>Heading A<|/ref|><|det|>[[10, 20, 400, 60]]<|/det|> body " +
      "<|ref|>image<|/ref|><|det|>[[550, 100, 990, 400], [560, 410, 600, 450]]<|/det|> more " +
      "<|ref|>image<|/ref|><|det|>[[10, 500, 450, 900]]<|/det|> tail"
    assert(Grounding.parse(s) == Seq(
      Ref("Heading A", 10, 20, 400, 60, isImage = false, "Heading A"),
      Ref("image", 550, 100, 990, 400, isImage = true, "![](images/0.jpg)"),
      Ref("image", 10, 500, 450, 900, isImage = true, "![](images/1.jpg)")))
  }

  test("malformed markup degrades safely (no det, truncated det)") {
    assert(Grounding.parse("<|ref|>orphan<|/ref|> no det here") == Seq.empty)
    assert(Grounding.parse("<|ref|>t<|/ref|><|det|>[[1, 2]]<|/det|>") == Seq.empty)
    assert(Grounding.parse("<|ref|>t<|/ref|><|det|>[[1, 2, 3, 4") == Seq.empty)
    assert(Grounding.parse("<|ref|>t<|/ref|><|det|>[]<|/det|>") == Seq.empty)
    assert(Grounding.parse("<|ref|>t<|/ref|><|det|>[[a, b, c, d]]<|/det|>") == Seq.empty)
    assert(Grounding.parse("<|ref|>t<|/ref|><|det|>[[1, 2.5, 3, 4]]<|/det|>") == Seq.empty)
  }

  test("reading order: XY-cut over det boxes, not stream order") {
    // stream order: right-column ref first; reading order: left column first
    val s = "<|ref|>right<|/ref|><|det|>[[550, 0, 990, 40]]<|/det|>" +
      "<|ref|>left<|/ref|><|det|>[[0, 10, 450, 50]]<|/det|>"
    val ord = Grounding.readingOrder(s).map { case (r, _, pos) => r.text -> pos }.toMap
    assert(ord == Map("left" -> 0, "right" -> 1))
  }

  test("synthesize → parse inverts the rule including image numbering") {
    for (id <- 0L until 30L) {
      val refs = Grounding.parse(Grounding.synthesize(id))
      assert(refs.length == Grounding.refCount(id))
      var imgSeen = 0
      refs.zipWithIndex.foreach { case (r, i) =>
        assert(r.text == Grounding.refText(id, i))
        assert(r.x1 == Grounding.refCol(id, i) * 550 && r.y1 == Grounding.refY(id, i))
        if (Grounding.refKind(id, i) == "image") {
          assert(r.frag == s"![](images/$imgSeen.jpg)")
          imgSeen += 1
        } else assert(r.frag == r.text)
      }
    }
  }
}
