package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.PackOps

class PackSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("matches the per-source window formulation bit-for-bit") {
    import spark.implicits._
    val got = PackOps.packChunks(spark, docs)
      .orderBy("source", "doc_id").collect().toSeq
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .select($"doc_id", $"source",
        size(split($"text", " ", -1)).cast("long").as("toks"))
      .withColumn("start_tok", coalesce(sum($"toks").over(w), lit(0L)))
      .withColumn("chunk_first", $"start_tok" / PackOps.Capacity cast "long")
      .withColumn("chunk_last",
        ($"start_tok" + $"toks" - 1) / PackOps.Capacity cast "long")
      .withColumn("n_chunks", $"chunk_last" - $"chunk_first" + 1)
      .select("doc_id", "source", "toks", "start_tok", "chunk_first",
        "chunk_last", "n_chunks")
      .orderBy("source", "doc_id").collect().toSeq
    assert(got == want)
  }

  test("start offsets are contiguous per source and independent of parallelism") {
    val a = PackOps.packChunks(spark, docs, parts = 1)
      .orderBy("source", "doc_id").collect().toSeq
    val b = PackOps.packChunks(spark, docs, parts = 7)
      .orderBy("source", "doc_id").collect().toSeq
    assert(a == b, "partition count must not change packing")
    // within a source the stream is gapless: next start = prev start + toks
    a.groupBy(_.getString(1)).foreach { case (src, rows) =>
      rows.sliding(2).foreach {
        case Seq(p, q) =>
          assert(q.getLong(3) == p.getLong(3) + p.getLong(2), s"gap in $src")
        case _ =>
      }
      assert(rows.head.getLong(3) == 0L, s"$src must start at token 0")
    }
  }

  test("chunk arithmetic: boundary-exact documents") {
    import spark.implicits._
    val d = Seq(
      (1L, "s", Seq.fill(256)("w").mkString(" ")),  // exactly one chunk
      (2L, "s", Seq.fill(10)("w").mkString(" ")),   // starts chunk 1
      (3L, "s", Seq.fill(500)("w").mkString(" "))   // spans chunks 1-2
    ).toDF("doc_id", "source", "text")
    val rows = PackOps.packChunks(spark, d, parts = 2)
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(4) == 0 && rows(0).getLong(5) == 0) // 0..255
    assert(rows(1).getLong(4) == 1 && rows(1).getLong(5) == 1) // 256..265
    assert(rows(2).getLong(4) == 1 && rows(2).getLong(5) == 2) // 266..765
    assert(rows(2).getLong(6) == 2)
  }

  test("values survive a downstream coalesce(1) (the Verify write path)") {
    // coalesce merges the narrow chain into one task: anything derived
    // from TaskContext/spark_partition_id would silently change; the
    // explicit shard column must not
    val a = PackOps.packChunks(spark, docs).coalesce(1)
      .orderBy("source", "doc_id").collect().toSeq
    val b = PackOps.packChunks(spark, docs)
      .orderBy("source", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("mix_budget: greedy hash-order quota, window-formulation parity") {
    import spark.implicits._
    val got = graft.operators.MixOps.tokenBudget(spark, docs)
      .orderBy("source", "doc_id").collect().toSeq
    val w = Window.partitionBy($"source")
      .orderBy($"ord", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .select($"doc_id", $"source",
        graft.functions.Hashing.md5iCol(
          concat(lit("mx|"), $"doc_id".cast("string"))).as("ord"),
        size(split($"text", " ", -1)).cast("long").as("toks"))
      .withColumn("start_tok", coalesce(sum($"toks").over(w), lit(0L)))
      .withColumn("kept",
        when($"start_tok" + $"toks" <= graft.operators.MixOps.BudgetPerSource, 1L)
          .otherwise(0L))
      .select("doc_id", "source", "toks", "start_tok", "kept")
      .orderBy("source", "doc_id").collect().toSeq
    assert(got == want)
    // both kept and cut docs must exist for the quota to mean anything
    val keptCounts = got.groupBy(_.getString(1))
      .map { case (_, rs) => rs.count(_.getLong(4) == 1L) }
    assert(keptCounts.exists(_ > 0) && got.exists(_.getLong(4) == 0L))
  }

  test("no window funnel; pass B is narrow above the cached shard layout") {
    val p = PackOps.packChunks(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "prefix sum must not use a window funnel")
    val scan = p.indexOf("InMemoryTableScan")
    assert(scan >= 0, p)
    assert(!p.substring(0, scan).contains("Exchange"),
      "emit pass must read the cached shards without another shuffle")
  }
}
