package graft

import graft.plans.TopKPerKeyPlans
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Custom whole-operator plan (LogicalPlan + Rule + Strategy +
  * SparkPlan via extensions): rank-filter windows must re-plan as
  * sort-free bounded-heap TopKPerKeyExec with identical results.
  */
class TopKPlanSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSuite.spark
    TopKPerKeyPlans.TopKPerKeyExtension.install(s)
    s
  }

  private def topkDf(k: Int) = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("value_c", floor($"value" * 100).cast("long"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"value_c".desc, $"event_id")))
      .filter($"rnk" <= k)
      .select($"user_id", $"event_id", $"value_c", $"rnk")
  }

  test("rank-filter window re-plans to heap exec: no Sort, no Window") {
    val plan = topkDf(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("Sort "), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
  }

  test("results identical to the window formulation") {
    import spark.implicits._
    val got = topkDf(3).as[(Long, Long, Long, Int)].collect().toSet
    // reference: compute without the rewrite by bounding via a HAVING-free
    // groupKey sort in plain Scala
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"event_id", floor($"value" * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((u, e, v), i) => (u, e, v, i + 1) }
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("k larger than any group emits whole groups, ranked") {
    import spark.implicits._
    val n = topkDf(1000000).count()
    val total = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(n == total)
  }

  test("global top-k (empty partitionBy) stays on Spark's own plan") {
    import spark.implicits._
    // ClusteredDistribution(Nil) is rejected by Spark — the rewrite must
    // decline, not crash at planning, and results must stay correct.
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("rnk", row_number().over(
        Window.orderBy($"event_id")))
      .filter($"rnk" <= 5)
      .select($"event_id", $"rnk")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey "), plan)
    val got = df.as[(Long, Int)].collect().sortBy(_._2)
    assert(got.length == 5 && got.map(_._1).sorted.sameElements(got.map(_._1)))
  }

  test("Long rank bound beyond Int.MaxValue falls back instead of truncating") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"event_id")).cast("long"))
      .filter($"rnk" <= 4294967298L)
      .select($"event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey "), plan)
    // bound exceeds every group size → all rows survive
    val total = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(df.count() == total)
  }

  test("rewrite declines multi-expression / non-row_number windows") {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"value".desc)
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey ")) // rank() has tie semantics
    assert(plan.contains("Window"))
  }
}
