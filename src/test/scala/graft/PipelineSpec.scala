package graft

import graft.corpus.CorpusDerive
import graft.pipeline.Extraction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-scale invariants over the sf0.001 testdata (FIXTURES.md §5) —
  * analog of the reference's schema/invariant tests that run without
  * heavy assets (tests/baseline.rs:150-244).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val extracted = {
    val e = Extraction.pipeline(CorpusDerive.derive(spark, sf))
    e.cache(); e.count(); e
  }

  test("span order is dense and gapless per doc") {
    import spark.implicits._
    val bad = extracted.select($"doc_id", $"spans.order".as("orders"))
      .filter(expr("orders != sequence(0, size(orders) - 1)") &&
              expr("size(orders) > 0"))
      .count()
    assert(bad == 0)
  }

  test("output kinds are exactly the contract set") {
    import spark.implicits._
    val kinds = extracted.select(explode($"spans.kind").as("k"))
      .distinct().as[String].collect().toSet
    assert(kinds == Set("heading", "paragraph", "table", "figure"))
  }

  test("media_ref conservation: every input media ref appears exactly once in output") {
    import spark.implicits._
    val in = CorpusDerive.derive(spark, sf)
      .select(explode($"spans").as("s")).filter($"s.media_ref" =!= "")
      .groupBy($"s.media_ref".as("r")).count()
    val out = extracted.select(explode($"spans").as("s"))
      .filter($"s.kind" === "figure")
      .groupBy($"s.media_ref".as("r")).count()
    assert(in.join(out, Seq("r"), "full_outer")
      .filter(in("count").isNull || out("count").isNull || in("count") =!= out("count"))
      .count() == 0)
  }

  test("boilerplate text is absent from output") {
    import spark.implicits._
    val n = extracted.select(explode($"spans.text").as("t"))
      .filter($"t".contains("footer copyright") || $"t".contains("[home]"))
      .count()
    assert(n == 0)
  }

  test("normalize removed the EOS sentinel and CRLF everywhere") {
    import spark.implicits._
    val n = extracted.select(explode($"spans.text").as("t"))
      .filter($"t".contains(graft.extract.Kernel.EosSentinel) || $"t".contains("\r"))
      .count()
    assert(n == 0)
  }

  test("doc count is conserved through the pipeline") {
    val in = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(extracted.count() == in)
  }
}
