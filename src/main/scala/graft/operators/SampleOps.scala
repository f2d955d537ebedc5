package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & dataset-split operators for training-data
  * pipelines: hash-based Bernoulli sampling stratified by a key, and
  * stable train/val/test assignment.
  *
  * Hash-gate sampling (keep iff md5i(salt|id) % 100 < pct) beats
  * `df.sample()` at corpus scale because membership is a PURE FUNCTION
  * of the row: reproducible across runs/retries/engines (no RNG state,
  * no partition-order dependence), stable under resume, and pushable
  * anywhere in the plan. Same construction as the stratified designs in
  * "Stratified Random Sampling over Streaming and Stored Data"
  * (EDBT 2019, PAPERS.md) — per-stratum gates with deterministic keys.
  */
object SampleOps {

  private def gate(salt: String, id: Column): Column =
    Hashing.md5iCol(concat(lit(salt + "|"), id.cast("string"))) % 100L

  /** Stratified gate: the stratum value is folded into the hash salt, so
    * each stratum draws an INDEPENDENT deterministic sample (two strata
    * never share gate values through a common doc_id stream).
    */
  private def stratGate(salt: String, stratum: Column, id: Column): Column =
    Hashing.md5iCol(concat(lit(salt + "|"), stratum.cast("string"),
      lit("|"), id.cast("string"))) % 100L

  /** Per-stratum deterministic Bernoulli sample at `pct` percent. */
  def stratifiedSample(docs: DataFrame, stratum: String, pct: Int): DataFrame =
    docs.filter(stratGate("sample", col(stratum), col("doc_id")) < pct)

  /** Stratum-level accounting: totals, sampled counts. */
  def sampleStats(docs: DataFrame, stratum: String, pct: Int): DataFrame =
    docs.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_total"),
        sum(when(stratGate("sample", col(stratum), col("doc_id")) < pct, 1L)
          .otherwise(0L)).as("n_sampled"))

  /** Stable 80/10/10 split assignment — a pure function of doc_id ONLY
    * (deliberately un-stratified: a document must land in the same split
    * regardless of which stratum view examines it, or train/test leak).
    */
  def splitColumn(id: Column): Column = {
    val g = gate("split", id)
    when(g < 80L, "train").when(g < 90L, "val").otherwise("test")
  }

  /** Split sizes per stratum — the audit table for dataset cards. */
  def splitStats(docs: DataFrame, stratum: String): DataFrame =
    docs.withColumn("split", splitColumn(col("doc_id")))
      .groupBy(col(stratum), col("split"))
      .agg(count(lit(1)).as("n"))

  /** Deterministic weighted sample without replacement: the `k` docs per
    * source with the smallest priority = md5i("ws|doc_id") div weight.
    * Higher weight (here n_chars) → proportionally smaller priority —
    * the integer-exact analog of the Efraimidis-Spirakis A-ES
    * exponential race (rank by u^(1/w)), with the float pow replaced by
    * floor division on the 60-bit hash so both engines stay
    * bit-identical. Like the hash gates above, membership is a pure
    * function of the row: reproducible under retries/resume and
    * independent of partitioning. The rank-filter shape re-plans to the
    * native TopKPerKey bounded-heap exec — one exchange, no global sort.
    */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("source"), col("doc_id"),
        Hashing.md5iCol(concat(lit("ws|"), col("doc_id").cast("string")))
          .as("h"), greatest(col("n_chars"), lit(1L)).as("w"))
      .withColumn("prio", expr("h div w"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("prio"), col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("source"), col("doc_id"), col("prio"), col("rnk"))
  }
}
