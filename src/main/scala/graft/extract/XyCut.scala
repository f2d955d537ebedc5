package graft.extract

/** Recursive XY-cut reading-order recovery (Nagy & Seth 1984) — the
  * 2-D layout analysis step the reference's grid-shaped tile reorder is
  * a special case of (ref crates/core/src/model/mod.rs:403-434: tiles
  * re-interleave by (row, col); a page grid IS the trivially-cuttable
  * layout). The span kernel's offset sort covers the 1-D input contract;
  * this operator covers documents whose spans carry 2-D boxes (PDF
  * layout): naive (y, x) sorting interleaves multi-column text, XY-cut
  * orders each column fully before the next.
  *
  * Algorithm, deterministic by construction:
  *   - project boxes onto X; if the occupied intervals leave ≥1 gap,
  *     split into vertical slices (left → right) and recurse. X cuts are
  *     preferred: a column gap must win over incidental row gaps or the
  *     columns interleave;
  *   - else project onto Y and split at horizontal gaps (top → bottom);
  *   - else (no gaps on either axis) emit by (y0, x0, input index) —
  *     the stable leaf order.
  *
  * A full-width header above two columns exercises both branches: no
  * X gap exists while the header spans the page, so the first cut is
  * horizontal (header band | body band), and the body band then splits
  * at the column gap. Singleton and empty inputs are leaves.
  */
object XyCut {

  /** Axis-aligned box; coordinates are inclusive-exclusive [x0, x1). */
  final case class Box(x0: Int, y0: Int, x1: Int, y1: Int)

  /** Reading order: returns the input indices of `boxes` in XY-cut
    * order (result(k) = index of the k-th box to read).
    */
  def order(boxes: IndexedSeq[Box]): IndexedSeq[Int] = {
    val out = new Array[Int](boxes.length)
    var n = 0
    def emit(i: Int): Unit = { out(n) = i; n += 1 }

    def leaf(idxs: Array[Int]): Unit =
      idxs.sortBy(i => (boxes(i).y0, boxes(i).x0, i)).foreach(emit)

    /** Occupied-interval gaps of the projection [lo(i), hi(i)): cut
      * points strictly inside the span of the group, each with its gap
      * width.
      */
    def gaps(idxs: Array[Int], lo: Int => Int, hi: Int => Int): Array[(Int, Int)] = {
      val byLo = idxs.sortBy(lo)
      val cuts = Array.newBuilder[(Int, Int)]
      var reach = hi(byLo(0))
      var i = 1
      while (i < byLo.length) {
        val b = byLo(i)
        if (lo(b) > reach) cuts += ((reach, lo(b) - reach))
        if (hi(b) > reach) reach = hi(b)
        i += 1
      }
      cuts.result()
    }

    def split(idxs: Array[Int], cuts: Array[Int], lo: Int => Int): Seq[Array[Int]] = {
      val bounds = cuts :+ Int.MaxValue
      val groups = Array.fill(bounds.length)(Array.newBuilder[Int])
      idxs.foreach { i =>
        var g = 0
        while (lo(i) >= bounds(g)) g += 1
        groups(g) += i
      }
      groups.map(_.result()).toSeq
    }

    def recurse(idxs: Array[Int]): Unit = {
      if (idxs.length <= 1) { idxs.foreach(emit); return }
      val xCuts = gaps(idxs, i => boxes(i).x0, i => boxes(i).x1)
      if (xCuts.nonEmpty) {
        // columns: cut at EVERY x gap at once — vertical slices are
        // independent and further x cuts would recur anyway
        split(idxs, xCuts.map(_._1), i => boxes(i).x0).foreach(recurse)
      } else {
        val yCuts = gaps(idxs, i => boxes(i).y0, i => boxes(i).y1)
        if (yCuts.nonEmpty) {
          // rows: cut ONLY the widest gap (topmost on ties), then let
          // each band re-check for column gaps — cutting every y gap at
          // once would break 2-column bodies whose row leading leaves
          // page-wide gaps (e.g. a full-width header above columns)
          val widest = yCuts.maxBy { case (pos, w) => (w, -pos) }._1
          split(idxs, Array(widest), i => boxes(i).y0).foreach(recurse)
        } else leaf(idxs)
      }
    }

    if (boxes.nonEmpty) recurse(boxes.indices.toArray)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
