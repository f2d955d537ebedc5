package graft

import graft.verify.Parity
import org.scalatest.funsuite.AnyFunSuite

/** Banded stage-parity harness (A7): the diff reducer must report exact
  * stats and FLAG out-of-band drift (reference analog:
  * tests/baseline.rs:333-387 per-stage tolerance bands, 918-946
  * max-abs-diff reduce).
  */
class ParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  test("in-band drift passes with exact max reported") {
    import spark.implicits._
    val df = Seq((1.0, 1.0000004), (2.0, 2.0), (3.0, 2.9999999))
      .toDF("a", "b")
    val r = Parity.stageDiff("s", df, $"a", $"b", bandQ6 = 1L)
      .as[(String, Long, Long, Long, Long, Long)].head()
    // max |a-b| = 4e-7 -> q6 floor = 0; all rows inside band 1e-6
    assert(r == (("s", 3L, 0L, 0L, 1L, 1L)))
  }

  test("out-of-band drift is flagged, over-band rows counted") {
    import spark.implicits._
    val df = Seq((1.0, 1.5), (2.0, 2.0), (3.0, 3.25)).toDF("a", "b")
    val r = Parity.stageDiff("s", df, $"a", $"b", bandQ6 = 100000L)
      .as[(String, Long, Long, Long, Long, Long)].head()
    // max = 0.5 -> 500000 q6; 2 rows exceed band 0.1
    assert(r == (("s", 3L, 500000L, 2L, 100000L, 0L)))
  }

  test("empty stage frame: zero rows, pass (no evidence of drift)") {
    import spark.implicits._
    val df = Seq.empty[(Double, Double)].toDF("a", "b")
    val r = Parity.stageDiff("s", df, $"a", $"b", bandQ6 = 0L)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(r == (("s", 0L, 0L, 0L, 0L, 1L)))
  }

  test("corpus parity stages all pass at sf0.001") {
    import spark.implicits._
    val rows = Parity.parityStats(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("tokens", "quality_mwl", "quality_stop"))
    assert(rows.values.forall(_._6 == 1L), s"stage failed: $rows")
    assert(rows("tokens")._3 == 0L) // tokenizer stage exact
    assert(rows("quality_mwl")._3 < 1000000L) // quantization strictly in band
  }
}
