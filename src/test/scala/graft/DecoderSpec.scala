package graft

import graft.extract.Decoder
import graft.functions.Hashing
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Decode-loop semantics: bound, EOS stop, monotonic progress, and
  * delta-reassembly equality (the reference's streaming-print property).
  */
class DecoderSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Toy deterministic LM: next-token scores derive from a hash of the
    * context; token `Eos` gets the top score once the context length
    * crosses a context-dependent threshold.
    */
  private val Eos = 99L
  private def toyStep(stopAfter: Int)(ctx: Seq[Long]): Seq[(Long, Double)] = {
    val h = Hashing.md5i(ctx.mkString(","))
    (0L until 8L).map(t => t -> ((h ^ (t * 0x9e3779b97f4a7c15L)) % 1000L).toDouble) :+
      (Eos -> (if (ctx.length >= stopAfter) 1e9 else -1e9))
  }

  test("argmax: deterministic tie-break on lower id") {
    assert(Decoder.argmax(Seq(3L -> 5.0, 1L -> 5.0, 2L -> 4.0)) == 1L)
    intercept[IllegalArgumentException](Decoder.argmax(Nil))
  }

  test("EOS stops the loop without emitting; budget bounds it") {
    val r = Decoder.decodeGreedy(Seq(1L, 2L), Eos, 100)(toyStep(stopAfter = 6))()
    assert(r.stoppedByEos && !r.generated.contains(Eos))
    assert(r.generated.length == 4) // ctx 2 + 4 generated = 6 → EOS
    val bounded = Decoder.decodeGreedy(Seq(1L), Eos, 3)(toyStep(stopAfter = 50))()
    assert(!bounded.stoppedByEos && bounded.generated.length == 3)
    val zero = Decoder.decodeGreedy(Seq(1L), Eos, 0)(toyStep(6))()
    assert(zero.generated.isEmpty && zero.steps == 0) // zero-budget short-circuit
  }

  test("property: progress is strictly monotonic and deltas reassemble exactly") {
    check(Prop.forAll(Gen.choose(1, 30), Gen.listOfN(3, Gen.choose(0L, 7L))) {
      (stopAfter, prompt) =>
        var last = 0
        val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
        var monotonic = true
        val r = Decoder.decodeGreedy(prompt, Eos, 20)(toyStep(stopAfter)) {
          (count, ids) =>
            if (count <= last) monotonic = false // ST2 guard would drop these
            deltas ++= ids.slice(last, count)    // ST1: decode only the delta
            last = count
        }
        monotonic && deltas.toSeq == r.generated && r.generated.length <= 20
    })
  }

  test("no-repeat-ngram: bans the completing token, falls back when empty") {
    // score table that always prefers token 1, then 2, then 3...
    // plain greedy: 1,1,1,... — with n=2 the second 1 is banned (1
    // followed 1's earlier occurrence), so it takes 2, then 1 is fine
    // again after context 2, etc.
    val step = (seq: Seq[Long]) =>
      (1L to 4L).map(t => (t, 10.0 - t)) :+ (0L, -100.0)
    val plain = Decoder.decodeGreedy(Seq.empty, 0L, 6)(step)()
    assert(plain.generated == Seq(1L, 1L, 1L, 1L, 1L, 1L))
    val guarded =
      Decoder.decodeGreedyNoRepeat(Seq.empty, 0L, 6, noRepeatNgramSize = 2)(step)()
    // 1 (no ctx) → ctx=1 bans nothing yet... after [1]: ctx=1, no earlier
    // occurrence followed by anything → allowed=all → 1 again? No:
    // seq=[1], occurrences of ctx=1 at j=0 need a follower at j+1 which
    // doesn't exist yet → no ban → 1. seq=[1,1]: ctx=1, occurrence at 0
    // followed by 1 → ban {1} → take 2. seq=[1,1,2]: ctx=2, no follower
    // → 1. seq=[1,1,2,1]: ctx=1, followers of earlier 1s = {1,2} → take
    // 3. seq=[1,1,2,1,3]: ctx=3 → 1.
    assert(guarded.generated == Seq(1L, 1L, 2L, 1L, 3L, 1L))
    // a window larger than anything the sequence can repeat is a no-op
    val wide =
      Decoder.decodeGreedyNoRepeat(Seq.empty, 0L, 6, noRepeatNgramSize = 20)(step)()
    assert(wide.generated == plain.generated)
    // all-banned fallback: vocab {5}, every continuation banned after
    // [5,5] — the guard stands down instead of deadlocking
    val one = (seq: Seq[Long]) => Seq((5L, 1.0), (0L, -1.0))
    val fb = Decoder.decodeGreedyNoRepeat(Seq.empty, 0L, 4, 2)(one)()
    assert(fb.generated.nonEmpty)
  }

  test("no-repeat-ngram: prompt participates in the ban window") {
    val step = (seq: Seq[Long]) => (1L to 4L).map(t => (t, 10.0 - t))
    // prompt [7,1,7]: ctx=7 has an earlier occurrence followed by 1 →
    // first generated token can't be 1
    val r = Decoder.decodeGreedyNoRepeat(Seq(7L, 1L, 7L), 0L, 1, 2)(step)()
    assert(r.generated == Seq(2L))
  }
}
