package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for representative queries so
  * plan shape (filter pushdown, column pruning, broadcast joins,
  * whole-stage codegen spans) can be reviewed — the discipline SURVEY.md
  * §4 calls for. Run: sbt "runMain graft.Plans [query ...]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("ta_quality", "q3_topk", "q6_filter", "ext_spans_full",
                         "dedup_ngram", "ann_topk")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
