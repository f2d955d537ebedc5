package graft.extract

import graft.functions.Hashing

/** PDF content-stream text extraction — the "PDF content-stream parsing"
  * half of the north star's layout stage (the other half, XY-cut
  * ordering, is [[XyCut]]). The parser is a REAL tokenizer + text-object
  * interpreter over the show-text subset of the PDF spec (ISO 32000-1
  * §9.4): BT/ET text objects, Tf font selection, Tm absolute and Td
  * relative positioning, Tj literal-string show, TJ array show with
  * kerning numbers, literal strings with `\( \) \\` escapes — enough to
  * invert any stream the synthesizer emits plus hand-written streams in
  * the spec's idiom. Y grows UP in PDF user space; extraction flips it
  * into screen coordinates before layout.
  *
  * The driver query follows the repo's media-decode pattern
  * (MediaOps/PixelOps): SYNTHESIZE spec-conformant bytes from a closed-
  * form rule, PARSE them with the real kernel, and let the DuckDB oracle
  * replay only the rule — hash equality then proves the parser inverted
  * the synthesis exactly (escape handling, kerning concatenation,
  * relative-motion chains, axis flip and all).
  */
object PdfStream {

  /** One positioned text run, in PDF user-space coordinates. */
  final case class Run(text: String, x: Int, y: Int)

  // ---------------------------------------------------------- synthesis

  /** Page height used for the PDF-y (bottom-up) ↔ screen-y flip. */
  val PageH = 940
  /** Column geometry shared with the oracle. */
  val ColW = 450
  val ColPitch = 550
  val RunH = 40

  /** Logical (screen-coordinate) run layout for doc `id`, run `i`:
    * column from md5i("pc|"), row from md5i("py|") — the same 2-column
    * geometry family as ext_xycut, under distinct salts.
    */
  def runCol(id: Long, i: Int): Int = (Hashing.md5i(s"pc|$id|$i") % 2L).toInt
  def runY(id: Long, i: Int): Int = (Hashing.md5i(s"py|$id|$i") % 900L).toInt
  def runCount(id: Long): Int = (id % 4 + 3).toInt

  /** Logical text of run i (what the parser must recover): parens when
    * the escape variant fires, a "_tj" tail when the TJ variant fires.
    */
  def runText(id: Long, i: Int): String = {
    val base = s"w${id}_$i"
    val esc = Hashing.md5i(s"pe|$id|$i") % 3L == 0L
    val tj = Hashing.md5i(s"pj|$id|$i") % 2L == 0L
    val core = if (esc) s"($base)" else base
    if (tj) core + "_tj" else core
  }

  private def escapeLit(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Spec-conformant content stream for doc `id`: one BT/ET text object,
    * runs positioned by an absolute Tm for run 0 and alternating Tm/Td
    * (md5i("pm|")-chosen) afterwards, TJ-variant runs emitted as
    * `[(core) -120 (_tj)] TJ`.
    */
  def synthesize(id: Long): String = {
    val sb = new StringBuilder("BT /F1 12 Tf")
    var px = 0; var py = 0
    (0 until runCount(id)).foreach { i =>
      val x = runCol(id, i) * ColPitch
      val yPdf = PageH - runY(id, i)
      val abs = i == 0 || Hashing.md5i(s"pm|$id|$i") % 2L == 0L
      if (abs) sb.append(s" 1 0 0 1 $x $yPdf Tm")
      else sb.append(s" ${x - px} ${yPdf - py} Td")
      px = x; py = yPdf
      val text = runText(id, i)
      if (text.endsWith("_tj"))
        sb.append(s" [(${escapeLit(text.dropRight(3))}) -120 (_tj)] TJ")
      else sb.append(s" (${escapeLit(text)}) Tj")
    }
    sb.append(" ET").toString
  }

  // ------------------------------------------------------------ parsing

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TArr(items: Vector[Tok]) extends Tok
  private final case class TName(s: String) extends Tok
  private final case class TOp(s: String) extends Tok

  /** Tokenizer for the show-text stream subset: numbers (sign/decimal),
    * literal strings with escapes, arrays, /names, alphabetic operators.
    */
  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def str(): TStr = { // at '(' — literal string with escapes
      i += 1
      val sb = new StringBuilder
      var depth = 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case '(' => sb.append('('); case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case c => sb.append(c)
            }
            i += 2
          case '(' => depth += 1; sb.append('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) sb.append(')')
            i += 1
          case c => sb.append(c); i += 1
        }
      }
      TStr(sb.toString)
    }
    def one(): Option[Tok] = {
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i >= s.length) return None
      s.charAt(i) match {
        case '(' => Some(str())
        case '[' =>
          i += 1
          val items = Vector.newBuilder[Tok]
          var done = false
          while (!done) {
            while (i < s.length && s.charAt(i).isWhitespace) i += 1
            if (i >= s.length || s.charAt(i) == ']') { i += 1; done = true }
            else one().foreach(items += _)
          }
          Some(TArr(items.result()))
        case '/' =>
          val j = i + 1
          i = j
          while (i < s.length && !s.charAt(i).isWhitespace &&
                 !"()[]/".contains(s.charAt(i))) i += 1
          Some(TName(s.substring(j, i)))
        case c if c == '-' || c == '+' || c == '.' || c.isDigit =>
          val j = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
          // A bare '-' / '+' / '.' is malformed; the subset-reader contract
          // is to skip unknown/malformed bytes, never kill the task.
          s.substring(j, i).toDoubleOption match {
            case Some(d) => Some(TNum(d))
            case None    => one()
          }
        case _ =>
          val j = i
          while (i < s.length && s.charAt(i).isLetter) i += 1
          if (i == j) { i += 1; one() } // skip unknown byte
          else Some(TOp(s.substring(j, i)))
      }
    }
    var t = one()
    while (t.isDefined) { out += t.get; t = one() }
    out.result()
  }

  /** Interpret the token stream: track the text position through Tm/Td,
    * emit a Run per Tj/TJ. Unknown operators consume their operands and
    * are ignored (spec behavior for a subset reader).
    */
  def parse(stream: String): Seq[Run] = {
    val runs = Seq.newBuilder[Run]
    var tx = 0.0; var ty = 0.0
    val stack = scala.collection.mutable.ArrayBuffer.empty[Tok]
    tokenize(stream).foreach {
      case TOp("Tm") =>
        if (stack.length >= 2) {
          (stack(stack.length - 2), stack.last) match {
            case (TNum(x), TNum(y)) => tx = x; ty = y
            case _ =>
          }
        }
        stack.clear()
      case TOp("Td") | TOp("TD") =>
        if (stack.length >= 2) {
          (stack(stack.length - 2), stack.last) match {
            case (TNum(dx), TNum(dy)) => tx += dx; ty += dy
            case _ =>
          }
        }
        stack.clear()
      case TOp("Tj") =>
        stack.lastOption.foreach { case TStr(t) => runs += Run(t, tx.toInt, ty.toInt); case _ => }
        stack.clear()
      case TOp("TJ") =>
        stack.lastOption.foreach {
          case TArr(items) =>
            val text = items.collect { case TStr(t) => t }.mkString
            runs += Run(text, tx.toInt, ty.toInt)
          case _ =>
        }
        stack.clear()
      case TOp("BT") => tx = 0; ty = 0; stack.clear()
      case TOp(_) => stack.clear() // ET, Tf, anything else: operands consumed
      case tok => stack += tok
    }
    runs.result()
  }

  /** Parse + layout: flip PDF y into screen space, box each run on the
    * synthesis geometry, XY-cut the boxes, return (runIndexInStream →
    * reading position) pairs alongside the run payloads.
    */
  def readingOrder(stream: String): Seq[(Run, Int)] = {
    val runs = parse(stream).toIndexedSeq
    val boxes = runs.map { r =>
      val yScreen = PageH - r.y
      XyCut.Box(r.x, yScreen, r.x + ColW, yScreen + RunH)
    }
    val ord = XyCut.order(boxes)
    ord.zipWithIndex.map { case (runIdx, pos) => (runs(runIdx), pos) }
  }
}
