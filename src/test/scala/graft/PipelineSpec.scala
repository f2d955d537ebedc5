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

  // Partial execution (SURVEY §4 O9 — the reference's
  // DEEPSEEK_OCR_LAYER_SLICE analog, ref decoder.rs:104-117): the
  // spark.graft.stages conf truncates the pipeline after a named stage,
  // and the PLAN reflects it (scan/kernel = no exchange; route/all = the
  // one sketch-routed exchange; markdown only rendered by `all`).
  test("spark.graft.stages truncates the pipeline with the matching plan shape") {
    import spark.implicits._
    def withStage[A](s: String)(f: => A): A = {
      spark.conf.set(Extraction.StagesConf, s)
      try f finally spark.conf.unset(Extraction.StagesConf)
    }
    val docs = CorpusDerive.derive(spark, sf)
    def plan(s: String) = withStage(s) {
      Extraction.pipeline(docs).queryExecution.executedPlan.toString
    }
    assert(!plan("scan").contains("Exchange"))
    assert(!plan("kernel").contains("Exchange"))
    assert(plan("route").contains("Exchange"))

    val scan = withStage("scan")(Extraction.pipeline(docs)
      .filter(size($"spans") > 0 || length($"markdown") > 0).count())
    assert(scan == 0, "scan stage must not run the kernel")
    val kernel = withStage("kernel") {
      val e = Extraction.pipeline(docs)
      (e.filter(size($"spans") > 0).count(), e.filter(length($"markdown") > 0).count())
    }
    assert(kernel._1 > 0 && kernel._2 == 0,
      "kernel stage extracts spans but must not render markdown")
    val route = withStage("route")(Extraction.pipeline(docs)
      .filter(length($"markdown") > 0).count())
    assert(route == 0, "route stage must not render markdown")
    // `all` under the conf round-trips to the default pipeline exactly
    val full = extracted.select($"doc_id", $"markdown").as[(String, String)]
      .collect().toMap
    val conf = withStage("all")(Extraction.pipeline(docs)
      .select($"doc_id", $"markdown").as[(String, String)].collect().toMap)
    assert(conf == full)
    intercept[IllegalArgumentException] {
      withStage("bogus")(Extraction.pipeline(docs))
    }
  }
}
