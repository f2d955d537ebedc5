package graft

import graft.extract.Kernel
import graft.functions.NormalizeText
import org.scalatest.funsuite.AnyFunSuite

/** Native-expression parity + codegen placement. */
class NormalizeExprSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  test("graft_normalize_text == Kernel.normalizeText, row for row") {
    import spark.implicits._
    NormalizeText.register(spark)
    val samples = Seq("a\r\nb", s"  x${Kernel.EosSentinel}  ", "", "plain",
      s"m\r\n${Kernel.EosSentinel}\r\n", "\ttab\t")
    val out = samples.toDF("s")
      .selectExpr("graft_normalize_text(s)").as[String].collect()
    assert(out.toSeq == samples.map(Kernel.normalizeText))
  }

  test("expression runs inside whole-stage codegen (not a UDF)") {
    import spark.implicits._
    NormalizeText.register(spark)
    // non-literal source so the projection survives constant folding
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("graft_normalize_text(concat(text, '\r\n')) AS n")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_normalize_text"))
    assert(plan.contains("*(1) Project")) // '*' = inside WholeStageCodegen
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    val first = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").select("text").as[String].head()
    assert(df.as[String].head().endsWith(first.takeRight(5).trim))
  }
}
