package graft.extract

/** Deterministic greedy decode loop — the dataflow skeleton of the
  * reference's `generate` (/root/reference/crates/core/src/model/
  * mod.rs:1333-1456): argmax next-token selection (A3), `max_new_tokens`
  * bound (T4), EOS early stop both at prefill and inside the loop (O11),
  * and a monotonic progress callback whose deltas reassemble to exactly
  * the final sequence (ST1/ST2 — cli/app.rs:150-170 prints only
  * `ids[last..count]` per callback; the server guard drops non-monotonic
  * callbacks, server/stream.rs:239-252).
  *
  * The "model" is abstracted to a pure `step: Seq[Long] => Seq[(Long,
  * Double)]` scoring function, so the loop's control semantics are
  * testable without any weights — scores in, ordered ids out.
  */
object Decoder {

  final case class DecodeResult(generated: Seq[Long], stoppedByEos: Boolean,
                                steps: Int)

  /** Argmax with deterministic tie-break on the lower token id (stable
    * across runs and engines, like the reference's fixed argmax).
    */
  def argmax(scores: Seq[(Long, Double)]): Long = {
    require(scores.nonEmpty, "empty score distribution")
    scores.minBy { case (id, s) => (-s, id) }._1
  }

  /** Greedy loop: extend `prompt` until EOS or `maxNewTokens`.
    * `onProgress(count, ids)` fires after each accepted token with the
    * full generated prefix — count is strictly increasing (ST2); a
    * consumer decoding only deltas reconstructs the exact output (ST1).
    */
  def decodeGreedy(prompt: Seq[Long], eos: Long, maxNewTokens: Int)(
      step: Seq[Long] => Seq[(Long, Double)])(
      onProgress: (Int, Seq[Long]) => Unit = (_, _) => ()): DecodeResult = {
    require(maxNewTokens >= 0, "negative token budget")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var stopped = false
    var i = 0
    while (i < maxNewTokens && !stopped) {
      val next = argmax(step(prompt ++ out))
      if (next == eos) stopped = true // EOS not emitted (mod.rs:1437-1441)
      else {
        out += next
        onProgress(out.length, out.toSeq)
      }
      i += 1
    }
    DecodeResult(out.toSeq, stopped, i)
  }

  /** [[decodeGreedy]] with HF-style no-repeat-ngram suppression — the
    * decode-config knob the reference's fixture capture sets
    * (no_repeat_ngram_size=20, ref scripts/capture_baseline.py:744):
    * before each argmax, any token that would complete an `n`-gram
    * already present in the sequence (prompt + generated) is banned.
    * The banned set is built from every earlier occurrence of the last
    * n−1 tokens; if the ban would empty the distribution entirely, the
    * guard stands down for that step (deterministic, oracle-replayable
    * fallback).
    */
  def decodeGreedyNoRepeat(prompt: Seq[Long], eos: Long, maxNewTokens: Int,
      noRepeatNgramSize: Int)(
      step: Seq[Long] => Seq[(Long, Double)])(
      onProgress: (Int, Seq[Long]) => Unit = (_, _) => ()): DecodeResult = {
    require(noRepeatNgramSize >= 2, "ngram size must be at least 2")
    require(maxNewTokens >= 0, "negative token budget")
    val n = noRepeatNgramSize
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var stopped = false
    var i = 0
    while (i < maxNewTokens && !stopped) {
      val seq = prompt ++ out
      val banned: Set[Long] =
        if (seq.length < n - 1) Set.empty
        else {
          val ctx = seq.takeRight(n - 1)
          (0 to seq.length - n).iterator
            .filter(j => seq.slice(j, j + n - 1) == ctx)
            .map(j => seq(j + n - 1)).toSet
        }
      val scores = step(seq)
      val allowed = scores.filterNot(s => banned(s._1))
      val next = argmax(if (allowed.nonEmpty) allowed else scores)
      if (next == eos) stopped = true
      else {
        out += next
        onProgress(out.length, out.toSeq)
      }
      i += 1
    }
    DecodeResult(out.toSeq, stopped, i)
  }
}
