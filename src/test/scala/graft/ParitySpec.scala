package graft

import graft.verify.Parity
import org.scalatest.funsuite.AnyFunSuite

/** Banded stage-parity harness (A7): the diff reducer must report exact
  * stats INCLUDING the argmax coordinates, and FLAG out-of-band drift
  * (reference analog: tests/baseline.rs:333-387 per-stage tolerance
  * bands, 918-946 max-abs-diff + argmax reduce).
  */
class ParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  private type Row7 = (String, Long, Long, Long, Long, Long, Long)

  test("in-band drift passes with exact max + argmax reported") {
    import spark.implicits._
    val df = Seq((10L, 1.0, 1.0000004), (20L, 2.0, 2.0), (30L, 2.9999999, 3.0))
      .toDF("k", "a", "b")
    val r = Parity.stageDiff("s", df, $"k", $"a", $"b", bandQ6 = 1L)
      .as[Row7].head()
    // max |a-b| = 4e-7 -> q6 floor = 0 for every row; argmax ties -> min key
    assert(r == (("s", 3L, 0L, 10L, 0L, 1L, 1L)))
  }

  test("out-of-band drift is flagged with the offending key") {
    import spark.implicits._
    val df = Seq((7L, 1.0, 1.5), (8L, 2.0, 2.0), (9L, 3.0, 3.5)).toDF("k", "a", "b")
    val r = Parity.stageDiff("s", df, $"k", $"a", $"b", bandQ6 = 100000L)
      .as[Row7].head()
    // max = 0.5 at keys 7 and 9 -> smallest key wins; 2 rows exceed 0.1
    assert(r == (("s", 3L, 500000L, 7L, 2L, 100000L, 0L)))
  }

  test("empty stage frame: zero rows, argmax -1, pass") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double, Double)].toDF("k", "a", "b")
    val r = Parity.stageDiff("s", df, $"k", $"a", $"b", bandQ6 = 0L)
      .as[Row7].head()
    assert(r == (("s", 0L, 0L, -1L, 0L, 0L, 1L)))
  }

  test("argmax is partitioning-invariant (merge order cannot leak)") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, i.toDouble, i.toDouble +
      (if (i % 7 == 0) 0.4 else 0.1)))
    val a = Parity.stageDiff("s", rows.toDF("k", "a", "b").repartition(1),
      $"k", $"a", $"b", 1000000L).as[Row7].head()
    val b = Parity.stageDiff("s", rows.toDF("k", "a", "b").repartition(32),
      $"k", $"a", $"b", 1000000L).as[Row7].head()
    assert(a == b)
    assert(a._4 == 7L) // smallest key attaining the 0.4 max
  }

  test("corpus parity stages all pass at sf0.001") {
    import spark.implicits._
    val rows = Parity.parityStats(spark, "/root/testdata/sf0.001")
      .as[Row7].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("tokens", "quality_mwl", "quality_stop"))
    assert(rows.values.forall(_._7 == 1L), s"stage failed: $rows")
    assert(rows("tokens")._3 == 0L) // tokenizer stage exact
    assert(rows("quality_mwl")._3 < 1000000L) // quantization strictly in band
    assert(rows("quality_mwl")._4 >= 0L) // a real argmax doc reported
  }
}
