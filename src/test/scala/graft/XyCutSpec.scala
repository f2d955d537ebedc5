package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.XyCut
import graft.extract.XyCut.Box

class XyCutSpec extends AnyFunSuite {

  test("two columns: each column reads fully before the next (naive y-sort fails)") {
    // left column L0,L1,L2 and right column R0,R1 interleaved in y
    val boxes = Vector(
      Box(0, 0, 40, 10),    // 0: L0
      Box(60, 5, 100, 15),  // 1: R0
      Box(0, 20, 40, 30),   // 2: L1
      Box(60, 25, 100, 35), // 3: R1
      Box(0, 40, 40, 50))   // 4: L2
    assert(XyCut.order(boxes) == Seq(0, 2, 4, 1, 3))
    // naive (y, x) order would interleave: 0,1,2,3,4
  }

  test("full-width header forces a horizontal first cut, then the column cut") {
    val boxes = Vector(
      Box(0, 0, 100, 8),    // 0: header spanning both columns
      Box(60, 20, 100, 30), // 1: R0
      Box(0, 22, 40, 32),   // 2: L0
      Box(60, 40, 100, 50), // 3: R1
      Box(0, 44, 40, 54))   // 4: L1
    // header first; then left column top-to-bottom; then right column
    assert(XyCut.order(boxes) == Seq(0, 2, 4, 1, 3))
  }

  test("nested cuts: footer under columns, sub-rows inside a column") {
    val boxes = Vector(
      Box(0, 0, 40, 10),    // 0: L row 1
      Box(0, 30, 40, 40),   // 1: L row 2 (y-gap inside left column)
      Box(60, 0, 100, 40),  // 2: R single tall block
      Box(0, 60, 100, 70))  // 3: full-width footer
    assert(XyCut.order(boxes) == Seq(0, 1, 2, 3))
  }

  test("no gaps anywhere: stable (y, x, idx) leaf order") {
    val boxes = Vector(
      Box(0, 0, 60, 20),   // overlaps everything
      Box(40, 10, 100, 30),
      Box(20, 10, 80, 25)) // same y0 as 1, smaller x0
    assert(XyCut.order(boxes) == Seq(0, 2, 1))
  }

  test("degenerate inputs") {
    assert(XyCut.order(Vector.empty) == Seq.empty)
    assert(XyCut.order(Vector(Box(5, 5, 6, 6))) == Seq(0))
  }

  test("grid layout reduces to the reference's tile order (column-major by cut)") {
    // 2x2 grid with gaps on both axes; X preferred -> column-major
    val boxes = Vector(
      Box(0, 0, 10, 10), Box(20, 0, 30, 10),
      Box(0, 20, 10, 30), Box(20, 20, 30, 30))
    assert(XyCut.order(boxes) == Seq(0, 2, 1, 3))
  }
}
