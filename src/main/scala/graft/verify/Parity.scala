package graft.verify

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tolerance-banded stage-parity harness — the A7 verification operator
  * (SURVEY §5.3): the reference's baseline tests compare each
  * intermediate stage (tokenizer, vision embeddings, logits) against
  * golden artifacts with a PER-STAGE tolerance band and report the max
  * absolute difference plus its location
  * (/root/reference/crates/core/tests/baseline.rs:333-387, 804-839,
  * 918-946). Re-expressed distributed: a stage is two numeric columns
  * (actual vs expected/golden) over the same keyed frame; the harness
  * reduces to (n_rows, max |a−b|, rows over band) in ONE agg — no
  * collect, scan-speed at 100 TB.
  *
  * Numeric discipline: the band compare and the reported max are
  * quantized to 1e-6 (floor) so the driver's hash-compare is bit-stable;
  * inputs are IEEE doubles derived from identical integer expressions in
  * both engines.
  */
object Parity {

  /** One stage's diff stats: (stage, n_rows, max_diff_q6, argmax_key,
    * n_over_band, band_q6, pass). The argmax key (smallest key attaining
    * the max diff; -1 for an empty stage) comes from the
    * [[MaxAbsDiff.agg]] typed Aggregator — the reference's verify reduce
    * reports the offending coordinates, not just the magnitude.
    */
  def stageDiff(stage: String, df: DataFrame, key: Column, a: Column,
                b: Column, bandQ6: Long): DataFrame = {
    val d = abs(a.cast("double") - b.cast("double"))
    val maxDiff = udaf(MaxAbsDiff.agg)
    df.agg(
        count(lit(1)).as("n_rows"),
        maxDiff(d, key.cast("long")).as("md"),
        coalesce(sum(when(floor(d * 1000000).cast("long") > bandQ6, 1L)
          .otherwise(0L)), lit(0L)).as("n_over_band"))
      .select(lit(stage).as("stage"), col("n_rows"),
        col("md.maxQ6").as("max_diff_q6"),
        col("md.atKey").as("argmax_key"),
        col("n_over_band"), lit(bandQ6).as("band_q6"),
        when(col("n_over_band") === 0L, 1L).otherwise(0L).as("pass"))
  }

  /** Driver query: three stage-parity checks over the corpus.
    *
    *  - `tokens` (band 0, exact): the kernel's token accounting
    *    ([[graft.operators.TokenOps.buildTokenStream]]) vs the
    *    closed-form token count — the tokenizer-stage golden.
    *  - `quality_mwl` (band 1.0): un-quantized mean-word-length ratio vs
    *    its floor-quantized published value — quantization error must
    *    stay strictly inside one unit.
    *  - `quality_stop` (band 1.0): same for the stopword ratio at 1e4
    *    scale.
    */
  def parityStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // tokenizer stage: kernel count vs closed form (11 heading tokens +
    // body words + 9 table tokens on %3 + 111 per image slot)
    val kernelTokens = graft.corpus.CorpusDerive.derive(spark, sfDir)
      .map { doc =>
        val ts = graft.operators.TokenOps.buildTokenStream(doc)
        // doc_id strings are "d%010d" — recover the numeric id
        (doc.doc_id.stripPrefix("d").toLong, ts.ids.length.toLong)
      }.toDF("doc_id", "actual")
    val formula = docs.select($"doc_id",
      (lit(11L) + size(split($"text", " ")).cast("long")
        + when($"doc_id" % 3 === 0, 9L).otherwise(0L)
        + lit(111L) * (when($"doc_id" % 2 === 0, 1L).otherwise(0L)
                       + when($"doc_id" % 4 === 0, 1L).otherwise(0L)))
        .as("expected"))
    val tokStage = stageDiff("tokens",
      kernelTokens.join(formula, "doc_id"), $"doc_id", $"actual",
      $"expected", bandQ6 = 0L)

    // quality stages: raw double ratio vs its floor-quantized value
    val ws = split($"text", " ")
    val nWords = size(ws).cast("long")
    val chars = aggregate(ws, lit(0L), (a, w) => a + length(w).cast("long"))
    val nStop = size(filter(ws,
      w => w.isin(graft.operators.TextOps.QualityStop: _*))).cast("long")
    val mwlRaw = when(nWords > 0, (chars * 100).cast("double") / nWords)
      .otherwise(0.0)
    val stopRaw = when(nWords > 0, (nStop * 10000).cast("double") / nWords)
      .otherwise(0.0)
    val q = docs.select($"doc_id", mwlRaw.as("mwl_raw"),
      floor(mwlRaw).as("mwl_q"), stopRaw.as("stop_raw"),
      floor(stopRaw).as("stop_q"))
    val mwlStage = stageDiff("quality_mwl", q, $"doc_id", $"mwl_raw",
      $"mwl_q", bandQ6 = 1000000L)
    val stopStage = stageDiff("quality_stop", q, $"doc_id", $"stop_raw",
      $"stop_q", bandQ6 = 1000000L)

    tokStage.unionAll(mwlStage).unionAll(stopStage)
  }
}
