package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedicated skew-salting measurement: interleaved salted/unsalted reps
  * in BOTH orders within one session, per hot-factor, printing every raw
  * rep — the discipline VERDICT r3 asked the official bench to adopt.
  * The skew dataset and interleave pattern come from [[Bench.skewedDocs]]
  * / [[Bench.SkewPattern]], so the probe measures EXACTLY the official
  * bench's scenario.
  * Run: `Test/runMain graft.SkewProbe <sfDir> <factor> <hotFactor...>`
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 800
    val hotFactors = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
                     else Seq(30, 60, 90)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    hotFactors.foreach { hot =>
      def run(saltBuckets: Int): Double = {
        val t0 = System.nanoTime()
        graft.pipeline.Extraction
          .pipeline(Bench.skewedDocs(spark, sfDir, factor, hot),
            saltBuckets = saltBuckets)
          .select(count(lit(1)), sum(size($"spans"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      run(64); run(1) // warm both paths
      val walls = Bench.SkewPattern.map(b => (b, run(b)))
      val s = walls.filter(_._1 == 64).map(_._2)
      val u = walls.filter(_._1 == 1).map(_._2)
      println(f"SKEWPROBE hot=$hot%3d salted_min=${s.min}%6.2f unsalt_min=${u.min}%6.2f " +
        f"ratio=${u.min / s.min}%5.2f  salted=[${s.map(x => f"$x%5.2f").mkString(",")}] " +
        f"unsalt=[${u.map(x => f"$x%5.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
