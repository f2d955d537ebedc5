package graft.operators

/** Fixed-size block windowing with pad/unpad — the analog of the
  * reference's SAM window partition (/root/reference/crates/core/src/
  * vision/sam.rs:848-902: pad an H×W grid to multiples of the window,
  * reshape into windows, process within each window, un-partition and
  * crop back). Re-expressed over 1-D token sequences: per-doc block-local
  * processing with exact inverse — no Spark shuffle, spans/tokens never
  * leave their row (SURVEY.md §2.5 W2).
  */
object WindowPartition {

  val DefaultWindow = 14

  /** Pad to a multiple of `window` (with `pad`) and split into blocks. */
  def partition[T](xs: Seq[T], window: Int = DefaultWindow)
                  (pad: T): (Seq[Seq[T]], Int) = {
    require(window > 0, "window must be positive")
    val rem = xs.length % window
    val padded = if (rem == 0) xs else xs ++ Seq.fill(window - rem)(pad)
    (padded.grouped(window).toSeq, xs.length)
  }

  /** Exact inverse: concatenate blocks and crop to the original length. */
  def unpartition[T](blocks: Seq[Seq[T]], originalLen: Int): Seq[T] =
    blocks.flatten.take(originalLen)

  /** Block-local map: process each window independently, restore order
    * and length. f must be length-preserving per block (like the
    * reference's within-window attention).
    */
  def mapWindows[T](xs: Seq[T], window: Int = DefaultWindow)(pad: T)(
      f: Seq[T] => Seq[T]): Seq[T] = {
    val (blocks, n) = partition(xs, window)(pad)
    val out = blocks.map { b =>
      val r = f(b)
      require(r.length == b.length, "window fn must preserve length")
      r
    }
    unpartition(out, n)
  }
}
