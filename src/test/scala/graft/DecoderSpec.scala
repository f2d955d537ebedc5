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
}
