package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Expert-routing analog of the reference's MoE dispatch
  * (/root/reference/crates/core/src/transformer/block.rs:650-722):
  * per token, rank expert scores descending, keep top-k (T1), renormalize
  * kept weights (A6), group rows by chosen expert for batched compute,
  * scatter results back by token id (J3).
  *
  * Spark shape: posexplode of the score vector (narrow) → per-token
  * window top-k (shuffle on token id — already the row key, so AQE
  * coalesces it into the scan partitioning when possible) → groupBy
  * expert for the batched stage. Weights stay exact rationals
  * (score, Σ top-k scores) instead of floats so the DuckDB oracle
  * reproduces rows bit-for-bit.
  */
object RouteOps {

  val NumExperts = 8
  val TopK = 2

  /** Route each embedding row to its top-k of the first `NumExperts`
    * quantized dims: (vec_id, expert_idx, rnk, score, score_topk_sum).
    * Ties break on expert index ascending (deterministic).
    */
  def routeTopK(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val q = SimilarityOps.quantized(emb)
      .select($"vec_id", slice($"q", 1, NumExperts).as("scores"))
    val exploded = q.select($"vec_id", posexplode($"scores"))
      .toDF("vec_id", "expert_idx", "score")
    val w = Window.partitionBy($"vec_id").orderBy($"score".desc, $"expert_idx")
    val top = exploded
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= TopK)
    top.withColumn("score_topk_sum",
        sum($"score").over(Window.partitionBy($"vec_id")))
      .select($"vec_id", $"expert_idx".cast("long").as("expert_idx"),
        $"rnk", $"score", $"score_topk_sum")
  }

  /** Batched per-expert stage + scatter-back: groups routed rows by
    * expert (the reference's index_select gather), applies `f` to each
    * expert's batch, returns rows keyed back by (vec_id, expert_idx).
    */
  def applyPerExpert(routed: DataFrame)(f: Long => Long): DataFrame = {
    import routed.sparkSession.implicits._
    routed.select($"vec_id", $"expert_idx", $"score")
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (expert, rows) =>
        rows.map { case (id, _, s) => (id, expert, f(s)) }
      }
      .toDF("vec_id", "expert_idx", "out")
  }
}
