package graft

import org.apache.spark.sql.SparkSession

/** Manual smoke driver for the SparkEntry contract surface:
  *   sbt "Test/runMain graft.EntrySmoke"
  * Mirrors what the round driver does: entry() rows>0 at sf0.001, then
  * each queries(name)(spark, sfDir) executes.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    e.show(20, false)
    println(s"ENTRY_ROWS=${e.count()}")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      println(s"QUERY $name rows=$n")
    }
    println(s"ORACLES=${SparkEntry.oracleSql.size} QUERIES=${SparkEntry.queries.size}")
    spark.stop()
  }
}
