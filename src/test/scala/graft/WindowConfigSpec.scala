package graft

import graft.functions.LayeredConfig
import graft.operators.WindowPartition
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** W2 window partition/unpartition roundtrip + J4 layered config merge. */
class WindowConfigSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("window partition: pad to multiple, exact inverse (sam.rs:848-902 analog)") {
    val (blocks, n) = WindowPartition.partition(1 to 30)(0)
    assert(blocks.forall(_.length == 14) && blocks.length == 3 && n == 30)
    assert(WindowPartition.unpartition(blocks, n) == (1 to 30))
  }

  test("property: partition∘unpartition == identity for any window") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 99)), Gen.choose(1, 20)) {
      (xs, w) =>
        val (blocks, n) = WindowPartition.partition(xs, w)(-1)
        WindowPartition.unpartition(blocks, n) == xs &&
          blocks.forall(_.length == w)
    })
  }

  test("mapWindows: block-local transform preserves global order/length") {
    val out = WindowPartition.mapWindows((1 to 18).toList, 6)(0)(_.reverse)
    assert(out.length == 18)
    assert(out.take(6) == (1 to 6).reverse)
    assert(out.slice(12, 18) == (13 to 18).reverse)
  }

  test("layered config: primary wins, fallback fills, env mapping (config/mod.rs:326-358 analog)") {
    val conf = LayeredConfig.resolve(
      Map("a.b" -> "override"),
      Map("a.b" -> "file", "c.d" -> "2"),
      Map("a.b" -> "default", "c.d" -> "9", "e.f" -> "true"))
    assert(conf.get("a.b").contains("override"))
    assert(conf.getInt("c.d", 0) == 2)
    assert(conf.getBool("e.f", false))
    assert(conf.get("missing").isEmpty)
    assert(LayeredConfig.fromEnv(Map("SPARK_GRAFT_SCALE_N" -> "4", "HOME" -> "/x"))
      == Map("scale.n" -> "4"))
  }
}
