package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.PdfStream
import graft.extract.PdfStream.Run

class PdfStreamSpec extends AnyFunSuite {

  test("hand-written stream: escapes, kerning arrays, Td chains, axis state") {
    val s = "BT /F2 9 Tf 1 0 0 1 100 800 Tm (Hello \\(world\\)) Tj " +
      "0 -40 Td [(ab) -120 (cd) 3 (e)] TJ 1 0 0 1 550 800 Tm (right) Tj ET"
    assert(PdfStream.parse(s) == Seq(
      Run("Hello (world)", 100, 800),
      Run("abcde", 100, 760),
      Run("right", 550, 800)))
  }

  test("backslash escapes inside literals round-trip") {
    assert(PdfStream.parse("BT 1 0 0 1 0 0 Tm (a\\\\b\\nc) Tj ET") ==
      Seq(Run("a\\b\nc", 0, 0)))
  }

  test("unknown operators consume operands without corrupting position") {
    val s = "BT 1 0 0 1 10 20 Tm 2 Tr 0.5 0.5 0.5 rg (x) Tj ET"
    assert(PdfStream.parse(s) == Seq(Run("x", 10, 20)))
  }

  test("malformed bare sign/dot tokens are skipped, not fatal") {
    // A bare '-', '+', or '.' is not a number; the subset-reader contract
    // says skip malformed bytes (never NumberFormatException the task).
    val s = "BT - + . 1 0 0 1 10 20 Tm (x) Tj ET"
    assert(PdfStream.parse(s) == Seq(Run("x", 10, 20)))
  }

  test("synthesize → parse inverts text and position for many docs") {
    for (id <- 0L until 40L) {
      val runs = PdfStream.parse(PdfStream.synthesize(id))
      assert(runs.length == PdfStream.runCount(id), s"doc $id")
      runs.zipWithIndex.foreach { case (r, i) =>
        assert(r.text == PdfStream.runText(id, i), s"doc $id run $i")
        assert(r.x == PdfStream.runCol(id, i) * PdfStream.ColPitch)
        assert(r.y == PdfStream.PageH - PdfStream.runY(id, i))
      }
    }
  }

  test("readingOrder: column-major on the synthesis geometry") {
    for (id <- 0L until 20L) {
      val got = PdfStream.readingOrder(PdfStream.synthesize(id))
        .map { case (r, pos) => (r.text, pos) }.toMap
      val expect = (0 until PdfStream.runCount(id))
        .map(i => (PdfStream.runCol(id, i), PdfStream.runY(id, i), i))
        .sorted.zipWithIndex
        .map { case ((_, _, i), pos) => PdfStream.runText(id, i) -> pos }.toMap
      assert(got == expect, s"doc $id")
    }
  }
}
