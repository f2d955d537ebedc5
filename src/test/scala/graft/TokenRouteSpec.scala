package graft

import graft.operators.{RouteOps, TokenOps}
import graft.schema.{Doc, Span}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Token-stream + positional-merge + routing suites — the analog of the
  * reference's prompt-asset invariants (tests/baseline.rs:185-243) and
  * cache/inject arity tests.
  */
class TokenRouteSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def doc(spans: Span*) = Doc("d", spans)

  test("token stream: offset order, text mask 0, media expands to 111 ones") {
    val d = doc(
      Span("media", "", "img://1/0", 50),
      Span("text", "a b", "", 0),
      Span("text", "c", "", 100))
    val ts = TokenOps.buildTokenStream(d)
    assert(ts.ids.length == 2 + TokenOps.TokensPerImage + 1)
    assert(TokenOps.TokensPerImage == 111)
    assert(ts.maskOnes == 111)
    // first two tokens text (sorted by offset), then the image block, then c
    assert(!ts.mask(0) && !ts.mask(1) && ts.mask(2) && !ts.mask.last)
  }

  test("validTokenFilter (P6): keeps [0, 2^32) only, drops placeholders") {
    val ids = Array(-1L, 0L, 42L, TokenOps.MaxU32 - 1, TokenOps.MaxU32,
      1L << 59)
    assert(TokenOps.validTokenFilter(ids).toSeq ==
      Seq(0L, 42L, TokenOps.MaxU32 - 1))
    // placeholder blocks from a real stream are dropped wholesale
    val d = doc(Span("media", "", "img://1/0", 0))
    val ts = TokenOps.buildTokenStream(d)
    assert(TokenOps.validTokenFilter(ts.ids).isEmpty)
  }

  test("injectAtMask: exact scatter, arity errors (mod.rs:1259-1266 contract)") {
    val ids = Array(1L, -1L, 2L, -1L)
    val mask = Array(false, true, false, true)
    assert(TokenOps.injectAtMask(ids, mask, Seq(7L, 8L)).toSeq ==
      Seq(1L, 7L, 2L, 8L))
    intercept[IllegalArgumentException] {
      TokenOps.injectAtMask(ids, mask, Seq(7L))
    }
  }

  test("property: mask-ones invariant == 111 × media spans (A2 analog)") {
    val genSpan = for {
      isMedia <- Gen.oneOf(true, false)
      off <- Gen.choose(0, 10000)
      txt <- Gen.listOfN(3, Gen.alphaStr).map(_.mkString(" "))
    } yield if (isMedia) Span("media", "", s"img://x/$off", off)
            else Span("text", txt, "", off)
    check(Prop.forAll(Gen.listOf(genSpan)) { spans =>
      val ts = TokenOps.buildTokenStream(doc(spans: _*))
      val media = spans.count(_.kind == "media")
      ts.maskOnes == 111 * media &&
        TokenOps.injectAtMask(ts.ids, ts.mask,
          Seq.fill(ts.maskOnes)(42L)).count(_ == 42L) >= ts.maskOnes - 0
    })
  }

  test("routeTopK: top-2 by score desc with index tie-break; exact sums") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0.005f, 0.009f, 0.001f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(0.003f, 0.003f, 0.001f, 0f, 0f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = RouteOps.routeTopK(spark, emb)
      .select("vec_id", "expert_idx", "rnk", "score", "score_topk_sum")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // q = floor(1000*v) (floats land just below: 0.009f -> 8, 0.005f -> 4):
    // v0 scores (4,8,1,..) -> top2 = idx1(8), idx0(4), sum 12
    // v1 scores (3,3,1,..) -> tie on 3 -> idx0 then idx1 (tie-break)
    assert(out == Set(
      (0L, 1L, 1L, 8L, 12L), (0L, 0L, 2L, 4L, 12L),
      (1L, 0L, 1L, 3L, 6L), (1L, 1L, 2L, 3L, 6L)))
    // per-expert batched stage scatters back with ids preserved
    val applied = RouteOps.applyPerExpert(
      RouteOps.routeTopK(spark, emb))((_, s) => s * 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(applied.map(_._1) == Set(0L, 1L))
    assert(applied.exists { case (id, e, o) => id == 0L && e == 1L && o == 16L })
  }
}
