package graft

import graft.operators.SampleOps
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling invariants: reproducibility, disjoint complete
  * splits, approximate rates.
  */
class SampleOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("sample is reproducible and ~pct of the stratum") {
    import spark.implicits._
    val a = SampleOps.stratifiedSample(docs, "source", 10)
      .select("doc_id").as[Long].collect().toSet
    val b = SampleOps.stratifiedSample(docs, "source", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // pure function of the row — no RNG state
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.04 && rate < 0.2, s"rate $rate")
    // monotone in pct: 10% sample ⊂ 50% sample
    val big = SampleOps.stratifiedSample(docs, "source", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(big))
    // the stratum is part of the gate: stratifying by a different column
    // draws a different (still deterministic) sample
    val byLang = SampleOps.stratifiedSample(docs, "lang", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(byLang != a)
  }

  test("splits are disjoint, complete, stable, and ~80/10/10") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val withSplit = docs.withColumn("split", SampleOps.splitColumn(col("doc_id")))
    val counts = withSplit.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count()) // complete: every row exactly one split
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.7)
    assert(counts("val").toDouble / total < 0.2)
  }
}
