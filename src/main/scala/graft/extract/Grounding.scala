package graft.extract

import graft.functions.Hashing

/** Post-decode GROUNDING-MARKUP parsing — the reference pipeline's step
  * between raw decoded text and result.mmd (ref scripts/
  * capture_baseline.py:762-780: `re_match` extracts the grounding
  * matches, image refs are rewritten to `![](images/N.jpg)` with a
  * running index, remaining markup is stripped; the grounded-box overlay
  * comes from `process_image_with_refs`). The wire format is the public
  * DeepSeek-OCR grounding syntax:
  *
  *   <|ref|>text<|/ref|><|det|>[[x1, y1, x2, y2], ...]<|/det|>
  *
  * with box coordinates normalized to the 0-999 page square.
  *
  * This kernel inverts it: extract every (ref text, det boxes) pair,
  * compute the markdown fragment the capture rewrite would emit (image
  * refs become `![](images/<running image index>.jpg)`, other refs keep
  * their text), and order the refs by [[XyCut]] over their first det
  * box — closing the decode → grounding → layout → markdown chain over
  * real parsing instead of span-level classification alone.
  *
  * The driver query synthesizes spec-format markup from a closed-form
  * rule and the oracle replays only the rule (the media-decode pattern):
  * hash parity proves the parser inverts the syntax, the image-index
  * numbering, and the box geometry exactly.
  */
object Grounding {

  /** One grounded reference: its text, first det box (0-999 space),
    * whether the capture rewrite treats it as an image, and the markdown
    * fragment that rewrite emits for it.
    */
  final case class Ref(text: String, x1: Int, y1: Int, x2: Int, y2: Int,
                       isImage: Boolean, frag: String)

  private val RefOpen = "<|ref|>"
  private val RefClose = "<|/ref|>"
  private val DetOpen = "<|det|>"
  private val DetClose = "<|/det|>"

  /** Extract grounded refs in stream order; image numbering follows the
    * capture script's running enumeration of image matches.
    */
  def parse(decoded: String): Seq[Ref] = {
    val out = Seq.newBuilder[Ref]
    var i = 0
    var imgIdx = 0
    while ({ i = decoded.indexOf(RefOpen, i); i >= 0 }) {
      val tEnd = decoded.indexOf(RefClose, i + RefOpen.length)
      if (tEnd < 0) { i = decoded.length }
      else {
        val text = decoded.substring(i + RefOpen.length, tEnd)
        val dStart = decoded.indexOf(DetOpen, tEnd)
        val dEnd = if (dStart >= 0) decoded.indexOf(DetClose, dStart) else -1
        if (dStart == tEnd + RefClose.length && dEnd > dStart) {
          val boxes = decoded.substring(dStart + DetOpen.length, dEnd)
          // non-integer or wrong-arity coordinates degrade to a skipped
          // ref (never a thrown NumberFormatException killing the task)
          val first = boxes.dropWhile(c => c == '[' || c == ' ')
            .takeWhile(_ != ']')
            .split(',').flatMap(t => t.trim.toIntOption)
          if (first.length == 4) {
            val isImage = text == "image"
            val frag =
              if (isImage) { val f = s"![](images/$imgIdx.jpg)"; imgIdx += 1; f }
              else text
            out += Ref(text, first(0), first(1), first(2), first(3), isImage, frag)
          }
          i = dEnd + DetClose.length
        } else i = tEnd + RefClose.length
      }
    }
    out.result()
  }

  /** Reading order of the refs by XY-cut over their det boxes. Returns
    * (ref, streamIndex, readingPosition).
    */
  def readingOrder(decoded: String): Seq[(Ref, Int, Int)] = {
    val refs = parse(decoded).toIndexedSeq
    val boxes = refs.map(r => XyCut.Box(r.x1, r.y1, r.x2, r.y2))
    XyCut.order(boxes).zipWithIndex.map { case (refIdx, pos) =>
      (refs(refIdx), refIdx, pos)
    }
  }

  // ---------------------------------------------------------- synthesis

  val Kinds: Vector[String] = Vector("title", "text", "image", "table")

  def refCount(id: Long): Int = (id % 3 + 2).toInt
  def refKind(id: Long, i: Int): String =
    Kinds((Hashing.md5i(s"gk|$id|$i") % 4L).toInt)
  def refCol(id: Long, i: Int): Int = (Hashing.md5i(s"gc|$id|$i") % 2L).toInt
  def refY(id: Long, i: Int): Int = (Hashing.md5i(s"gy|$id|$i") % 900L).toInt
  def refText(id: Long, i: Int): String =
    if (refKind(id, i) == "image") "image" else s"s${id}_$i"

  /** Spec-format decoded text: grounded refs interleaved with prose;
    * every third ref carries a second det box (parser anchors on the
    * first).
    */
  def synthesize(id: Long): String = {
    val sb = new StringBuilder
    (0 until refCount(id)).foreach { i =>
      val x1 = refCol(id, i) * 550; val y1 = refY(id, i)
      sb.append(RefOpen).append(refText(id, i)).append(RefClose)
      sb.append(DetOpen)
        .append(s"[[$x1, $y1, ${x1 + 450}, ${y1 + 40}]")
      if (Hashing.md5i(s"gm|$id|$i") % 3L == 0L)
        sb.append(s", [${x1 + 10}, ${y1 + 50}, ${x1 + 60}, ${y1 + 90}]")
      sb.append(']').append(DetClose)
      sb.append(s" prose $i. ")
    }
    sb.toString
  }
}
