package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvMinsAgg
import graft.operators.TextOps

class KmvSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  test("unsaturated sketch IS the exact sorted distinct set") {
    import spark.implicits._
    val vals = Seq(5L, 3L, 9L, 3L, 5L, 7L)
    val got = vals.toDF("v").agg(KmvMinsAgg.column($"v", 16))
      .as[Seq[Long]].head()
    assert(got == Seq(3L, 5L, 7L, 9L))
  }

  test("saturated sketch keeps exactly the k smallest distinct values") {
    import spark.implicits._
    val vals = (100L to 1L by -1L) ++ (1L to 50L) // dups + reverse order
    val got = vals.toDF("v").agg(KmvMinsAgg.column($"v", 8))
      .as[Seq[Long]].head()
    assert(got == (1L to 8L))
  }

  test("partition count does not change the sketch (merge = union of minima)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rnd.nextLong().abs % 1000L)
    val expect = vals.distinct.sorted.take(12)
    for (parts <- Seq(1, 3, 17)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(KmvMinsAgg.column($"v", 12)).as[Seq[Long]].head()
      assert(got == expect, s"parts=$parts")
    }
  }

  test("vocabKmv: unsaturated groups report exact distinct counts") {
    import spark.implicits._
    // source A has 3 distinct words (< k=16) -> est == exact == 3
    val docs = Seq(
      (1L, "x y z", "A"), (2L, "x x y", "A"),
      (3L, (0 until 40).map(i => s"w$i").mkString(" "), "B"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.vocabKmv(docs, k = 16)
      .select($"source", $"k_used", $"est")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("A") == ((3L, 3L)))
    // B saturates: 40 distinct > 16 -> estimator path, k_used == 16
    assert(got("B")._1 == 16L)
    assert(got("B")._2 > 16L) // an estimate beyond the sketch size
  }

  test("estimator lands near the true cardinality on a large random set") {
    import spark.implicits._
    val n = 2000
    val docs = Seq((1L, (0 until n).map(i => s"tok$i").mkString(" "), "S"))
      .toDF("doc_id", "text", "source")
    val est = TextOps.vocabKmv(docs, k = 64)
      .select($"est").as[Long].head()
    // KMV with k=64 has ~1/sqrt(62) ≈ 13% relative error at 1 sigma;
    // assert a loose 3-sigma band — deterministic given the fixed hash
    assert(est > n * 0.6 && est < n * 1.4, s"est=$est for n=$n")
  }
}
