package graft

import graft.schema.{Doc, ExtractedSpan, Span}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

case class Fixture(schema_version: Int, doc_id: String, input_spans: Seq[Span],
                   expected_spans: Seq[ExtractedSpan], expected_markdown: String)

/** End-to-end span-sequence equality against frozen golden fixtures —
  * the analog of the reference's `baseline_generation_matches_reference`
  * exact-equality test (/root/reference/crates/core/tests/baseline.rs:477-706),
  * run through the FULL Spark pipeline (salt → repartitionByRange →
  * mapPartitions kernel), not just the kernel.
  */
class GoldenFixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val spanSchema = ArrayType(StructType(Seq(
    StructField("kind", StringType), StructField("text", StringType),
    StructField("media_ref", StringType), StructField("offset", IntegerType))))
  private val outSpanSchema = ArrayType(StructType(Seq(
    StructField("kind", StringType), StructField("text", StringType),
    StructField("media_ref", StringType), StructField("order", IntegerType))))
  private val fixtureSchema = StructType(Seq(
    StructField("schema_version", IntegerType),
    StructField("doc_id", StringType),
    StructField("input_spans", spanSchema),
    StructField("expected_spans", outSpanSchema),
    StructField("expected_markdown", StringType)))

  private lazy val fixtures: Seq[Fixture] = {
    import spark.implicits._
    val path = getClass.getResource("/golden/fixtures.json").getPath
    val fs = spark.read.schema(fixtureSchema).json(path).as[Fixture].collect().toSeq
    assert(fs.nonEmpty)
    fs
  }

  test("fixture loader asserts schema_version == 1 (baselines/README.md:20-21 pattern)") {
    fixtures.foreach(f => assert(f.schema_version == 1,
      s"fixture ${f.doc_id}: unsupported schema_version ${f.schema_version}"))
  }

  test("full Spark pipeline output equals golden span sequences, span for span") {
    import spark.implicits._
    val docs = spark.createDataset(fixtures.map(f => Doc(f.doc_id, f.input_spans)))
    val got = graft.pipeline.Extraction.pipeline(docs, shufflePartitions = 3)
      .collect().map(e => e.doc_id -> e).toMap
    fixtures.foreach { f =>
      val e = got(f.doc_id)
      assert(e.spans == f.expected_spans, s"span mismatch for ${f.doc_id}")
      assert(e.markdown == f.expected_markdown, s"markdown mismatch for ${f.doc_id}")
    }
    assert(got.size == fixtures.size)
  }

  test("pipeline output is invariant under parallelism (1 vs 4 shuffle partitions)") {
    import spark.implicits._
    val docs = spark.createDataset(fixtures.map(f => Doc(f.doc_id, f.input_spans)))
    val a = graft.pipeline.Extraction.pipeline(docs, shufflePartitions = 1)
      .collect().sortBy(_.doc_id).toSeq
    val b = graft.pipeline.Extraction.pipeline(docs, shufflePartitions = 4)
      .collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }
}
