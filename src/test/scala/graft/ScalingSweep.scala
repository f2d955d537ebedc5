package graft

import graft.schema.Doc
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One-off diagnostic: docs/sec of the extraction pipeline at a sweep of
  * thread counts, to locate this box's memory-bandwidth knee (drives the
  * choice of the official N→4N scaling config — see BENCH.md).
  */
object ScalingSweep {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sweep")
      .config("spark.sql.shuffle.partitions", cpus * 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def amplified(spark: SparkSession, sfDir: String, factor: Int): Dataset[Doc] = {
    import spark.implicits._
    graft.corpus.CorpusDerive.derive(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism * 4)
      .flatMap(d => (0 until factor).iterator.map(i => Doc(s"${d.doc_id}-$i", d.spans)))
  }

  private def run(spark: SparkSession, sfDir: String, factor: Int): (Long, Double) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val docs = graft.pipeline.Extraction.pipeline(amplified(spark, sfDir, factor))
      .select(count(lit(1))).as[Long].head()
    (docs, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 3200
    // warm JIT once at high parallelism
    locally { val s = session(16); try run(s, sfDir, factor / 2) finally s.stop() }
    Seq(1, 2, 4, 8, 16).foreach { n =>
      val s = session(n)
      try {
        val (d1, t1) = run(s, sfDir, factor)
        val (_, t2) = run(s, sfDir, factor)
        val t = math.min(t1, t2)
        println(f"SWEEP threads=$n%2d docs=$d1 sec=$t%.1f rate=${d1 / t / 1e6}%.3f M/s perThread=${d1 / t / n / 1e3}%.0f k/s")
      } finally s.stop()
    }
  }
}
