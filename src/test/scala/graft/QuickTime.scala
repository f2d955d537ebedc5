package graft

import org.apache.spark.sql.SparkSession

/** Focused query timing for iteration: `Test/runMain graft.QuickTime
  * <sfDir> <reps> <query...>` — runs each named SparkEntry query `reps`
  * times under noop write and prints per-rep walls + min.
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
                else Seq("dedup_ngram", "dedup_minhash")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-quicktime")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QUICKTIME $name%-20s min=${walls.min}%6.2f  " +
        walls.map(w => f"$w%5.2f").mkString(" "))
    }
    spark.stop()
  }
}
