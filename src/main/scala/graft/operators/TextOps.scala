package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All of these are NARROW per-row projections built from native
  * (codegen'd) expressions — no UDFs, no shuffle: at 100 TB they run at
  * scan speed with full column pruning (only `doc_id`,`text` are read).
  * The higher-order functions (`transform`/`filter`/`aggregate`) evaluate
  * inside whole-stage codegen, unlike a Scala UDF which would break it.
  *
  * Design parallel to the reference: these are the "prompt analysis" side
  * of its pipeline — deterministic token accounting
  * (/root/reference/crates/core/src/inference.rs:163-172 token counts,
  * vision_token_total invariants) re-expressed over document text.
  */
object TextOps {

  /** BPE-ish pretokenizer regex: word runs or single non-word non-space
    * symbols. POSIX-safe classes only, so Java (Spark) and RE2 (DuckDB)
    * agree.
    */
  val TokenRegex = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  // Stopword profiles for the n-gram/stopword language-ID heuristic.
  // Shared with the DuckDB oracle through sqlInList (single source of truth).
  val EnStop = Seq("the", "a", "and", "of", "to", "in", "is", "on")
  val EsStop = Seq("el", "la", "de", "y", "en", "que", "los", "un")
  val DeStop = Seq("der", "die", "das", "und", "ist", "ein", "mit", "von")
  val FrStop = Seq("le", "la", "de", "et", "les", "en", "un", "est")
  val QualityStop = Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  def sqlInList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  private def words(text: Column): Column = split(text, " ")

  private def countIn(ws: Column, set: Seq[String]): Column =
    size(filter(ws, w => w.isin(set: _*))).cast("long")

  /** (doc_id, n_tokens_ws, n_tokens_re): whitespace token count and
    * BPE-ish regex token count.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens_ws"),
      size(expr(s"regexp_extract_all(text, '$TokenRegex', 0)")).cast("long")
        .as("n_tokens_re"))

  /** Quality scoring: length band, mean word length, stopword ratio,
    * punctuation count → integer score. All ratios are quantized with
    * floor() (no rounding-tie divergence across engines).
    */
  def quality(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws).cast("long")
    val chars = aggregate(ws, lit(0L), (a, w) => a + length(w).cast("long"))
    val nStop = countIn(ws, QualityStop)
    val mwl = when(nWords > 0, floor(lit(100.0) * chars / nWords)).otherwise(0L)
    val stopQ = when(nWords > 0, floor(lit(10000.0) * nStop / nWords)).otherwise(0L)
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))).cast("long")
    docs.select(col("doc_id"), nWords.as("n_words"), mwl.as("mwl_q2"),
        stopQ.as("stop_q4"), nPunct.as("n_punct"))
      .withColumn("score",
        (when(col("n_words").between(50, 5000), 40L).otherwise(10L) +
         when(col("stop_q4") >= 200L, 30L).otherwise(0L) +
         when(col("mwl_q2").between(250L, 900L), 30L).otherwise(0L)).as("score"))
  }

  /** Stopword-profile language ID. Deterministic argmax with a fixed
    * precedence order (de, en, es, fr) on ties; all-zero → "und".
    */
  def langId(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val out = docs.select(col("doc_id"),
      countIn(ws, EnStop).as("c_en"), countIn(ws, EsStop).as("c_es"),
      countIn(ws, DeStop).as("c_de"), countIn(ws, FrStop).as("c_fr"))
    val m = greatest(col("c_en"), col("c_es"), col("c_de"), col("c_fr"))
    out.withColumn("pred_lang",
      when(m === 0L, "und")
        .when(col("c_de") === m, "de").when(col("c_en") === m, "en")
        .when(col("c_es") === m, "es").otherwise("fr"))
  }

  /** Hash space for the KMV vocabulary sketch: 2^40 keeps
    * (k−1)·M inside a signed long for any practical k while making
    * hash collisions negligible for vocabularies up to ~10^6.
    */
  val KmvSpace: Long = 1L << 40

  /** Per-source vocabulary cardinality via the KMV k-minimum-values
    * sketch ([[graft.functions.KmvMinsAgg]]): (source, k_used, kth, est)
    * with est = exact distinct count while the sketch is unsaturated,
    * else the KMV estimator (k−1)·M div h_k — all-integer, so the
    * DuckDB oracle replays it exactly (ORDER BY hash LIMIT k).
    *
    * The exchange moves ≤ k longs per (partition, source), never the
    * token stream: corpus-wide cardinality stats at scan cost.
    */
  def vocabKmv(docs: DataFrame, k: Int = 16): DataFrame = {
    val estNum = (k - 1).toLong * KmvSpace
    docs.select(col("source"), explode(words(col("text"))).as("w"))
      .select(col("source"), (Hashing.md5iCol(col("w")) % KmvSpace).as("hv"))
      .groupBy(col("source"))
      .agg(graft.functions.KmvMinsAgg.column(col("hv"), k).as("mins"))
      .select(col("source"),
        size(col("mins")).cast("long").as("k_used"),
        coalesce(element_at(col("mins"), -1), lit(0L)).as("kth"))
      .withColumn("est",
        when(col("k_used") < k, col("k_used"))
          .when(col("kth") > 0, expr(s"$estNum div kth"))
          .otherwise(lit(0L)))
  }

  /** HyperLogLog per-source vocabulary sketch (m = 256 registers, see
    * [[graft.functions.HllRegsAgg]]): one m-byte partial per partition
    * below a single exchange, element-wise-max merge, then a per-row
    * derivation of the register fingerprint and the integer HLL
    * estimate. Complements [[vocabKmv]]: KMV is exact below k; HLL holds
    * ~1.04/sqrt(m) relative error at ANY cardinality with constant
    * state. All derived values are integer arithmetic (Z scaled by
    * 2^RhoMax stays under 2^61; the alpha_256 = 0.7213/(1+1.079/256)
    * correction as the exact rational 1846528000/2570790000), so the
    * oracle replays every column bit-for-bit.
    */
  def vocabHll(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = 256
    docs.select(col("source"), explode(words(col("text"))).as("w"))
      .select(col("source"), Hashing.md5iCol(col("w")).as("hv"))
      .groupBy(col("source"))
      .agg(graft.functions.HllRegsAgg.column(col("hv"), m).as("regs"))
      .as[(String, Seq[Long])]
      .map { case (source, regs) =>
        val rhoMax = graft.functions.HllRegsAgg.RhoMax
        val nonzero = regs.count(_ > 0L).toLong
        val regFp = regs.zipWithIndex.map { case (r, j) =>
          (j + 1).toLong * (r * r * 31L + r + 7L)
        }.sum % 1000000007L
        val zsum = regs.map(r => 1L << (rhoMax - r.toInt)).sum
        val est = (BigInt(1846528000L) * m * m * (BigInt(1) << rhoMax) /
          (BigInt(2570790000L) * zsum)).toLong
        (source, nonzero, regFp, zsum % 1000000007L, est)
      }.toDF("source", "nonzero", "reg_fp", "z_mod", "est")
  }

  /** Polynomial rolling fingerprint of the word-hash sequence (order-
    * sensitive — two docs match iff their full word sequences match).
    * See [[Hashing.polyFp]] for the cross-engine contract.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val hs = transform(words(col("text")),
      w => Hashing.md5iCol(w) % Hashing.FpMod)
    docs.select(col("doc_id"),
      aggregate(hs, lit(0L), (a, h) => (a * 31 + h) % Hashing.FpMod).as("fp"))
  }
}
