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
  * Spark shape: the top-k of an 8-element score vector is a PER-ROW
  * computation, so it runs entirely in-row with codegen'd array
  * expressions (transform → sort_array on (-score, idx) structs → slice →
  * posexplode of k elements) — NO exchange. The previous
  * explode-then-window formulation paid a full shuffle on vec_id for
  * what is row-local arithmetic. Weights stay exact rationals
  * (score, Σ top-k scores) instead of floats so the DuckDB oracle
  * reproduces rows bit-for-bit. The groupBy-expert batched stage
  * ([[applyPerExpert]]) remains the only shuffle, as in the reference's
  * gather/scatter.
  */
object RouteOps {

  val NumExperts = 8
  val TopK = 2

  /** Route each embedding row to its top-k of the first `NumExperts`
    * quantized dims: (vec_id, expert_idx, rnk, score, score_topk_sum).
    * Ties break on expert index ascending (deterministic): sort_array is
    * ascending lexicographic on struct fields, so (-score, idx) sorts by
    * score desc then idx asc.
    */
  def routeTopK(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val q = SimilarityOps.quantized(emb)
      .select($"vec_id", slice($"q", 1, NumExperts).as("scores"))
    val ranked = q.select($"vec_id",
        slice(sort_array(
          expr("transform(scores, (s, i) -> struct(-s AS negs, i AS idx))")),
          1, TopK).as("top"))
      .withColumn("score_topk_sum",
        expr("aggregate(top, CAST(0 AS BIGINT), (a, x) -> a - x.negs)"))
    ranked
      .select($"vec_id", $"score_topk_sum", posexplode($"top"))
      .select($"vec_id", $"col.idx".cast("long").as("expert_idx"),
        ($"pos" + 1).cast("long").as("rnk"),
        (-$"col.negs").as("score"), $"score_topk_sum")
  }

  /** Batched per-expert stage + scatter-back: groups routed rows by
    * expert (the reference's index_select gather), applies `f(expert,
    * score)` to each expert's batch, returns rows keyed back by
    * (vec_id, expert_idx).
    */
  def applyPerExpert(routed: DataFrame)(f: (Long, Long) => Long): DataFrame = {
    import routed.sparkSession.implicits._
    routed.select($"vec_id", $"expert_idx", $"score")
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (expert, rows) =>
        rows.map { case (id, _, s) => (id, expert, f(expert, s)) }
      }
      .toDF("vec_id", "expert_idx", "out")
  }

  /** Deterministic per-expert compute kernel for the moe_apply oracle:
    * out = a_e·score + b_e with md5i-derived coefficients — the "each
    * expert applies its own weights" analog of the reference's per-expert
    * FFN (/root/reference/crates/core/src/transformer/block.rs:677-722),
    * exact in 64-bit (a_e < 10^6, |score| ≤ a few thousand quantized
    * units) so DuckDB replays it bit-for-bit.
    */
  def expertAffine(expert: Long, score: Long): Long =
    (graft.functions.Hashing.md5i(s"ea|$expert") % 1000000L + 1L) * score +
      graft.functions.Hashing.md5i(s"eb|$expert") % 1000000007L
}
