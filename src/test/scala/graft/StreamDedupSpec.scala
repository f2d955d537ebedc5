package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.StreamDedup

class StreamDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("streaming incremental dedup == batch LSH when no bucket exceeds the cap") {
    import spark.implicits._
    // near-dup pairs (shared long prefix) + unrelated docs
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val rows = (0L until 30L).map { i =>
      val text =
        if (i % 3 == 0) s"$base variant ${i / 3}"
        else if (i % 3 == 1) s"$base variant ${i / 3} x"
        else s"totally different content number $i with its own words here"
      (i, text)
    }
    val docs = docsDF(rows)
    val streamed = StreamDedup.streamingMinhashPairs(spark, docs, nBatches = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val batch = DedupOps.minhashPairs(spark, docs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // the variant pairs must actually collide
  }

  test("prefix cap bounds a flood: C(cap,2) full pairs + linear star, one component") {
    import spark.implicits._
    val n = 40
    val cap = 4
    val docs = docsDF((0L until n.toLong).map(i =>
      (i, "identical flood document body repeated verbatim in every copy")))
    val pairs = StreamDedup.streamingMinhashPairs(spark, docs, nBatches = 3,
        maxBucket = cap)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // first `cap` arrivals pair fully; the tail stars to doc 0 (= rep)
    val expected =
      (for { a <- 0 until cap; b <- a + 1 until cap } yield (a.toLong, b.toLong)).toSet ++
        (cap until n).map(b => (0L, b.toLong)).toSet
    assert(pairs == expected)
    // linear, not quadratic: C(cap,2) + (n - cap) pairs
    assert(pairs.size == cap * (cap - 1) / 2 + (n - cap))
    // single connected component via the representative
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2)
    val seen = collection.mutable.Set(0L)
    val stack = collection.mutable.Stack(0L)
    while (stack.nonEmpty) {
      adj.getOrElse(stack.pop(), Set.empty).foreach { v =>
        if (seen.add(v)) stack.push(v)
      }
    }
    assert(seen.size == n)
  }

  test("per-batch commits are replay-idempotent") {
    import spark.implicits._
    val docs = docsDF((0L until 12L).map(i => (i, s"shared body text $i")))
    val idxDir = java.nio.file.Files.createTempDirectory("sd-idx").toString
    val pairDir = java.nio.file.Files.createTempDirectory("sd-pair").toString
    val b0 = docs.filter($"doc_id" < 6)
    StreamDedup.processBatch(spark, b0, 0L, idxDir, pairDir, DedupOps.MaxBucket)
    val idxOnce = spark.read.parquet(s"$idxDir/batch=0").count()
    StreamDedup.processBatch(spark, b0, 0L, idxDir, pairDir, DedupOps.MaxBucket)
    assert(spark.read.parquet(s"$idxDir/batch=0").count() == idxOnce)
  }
}
