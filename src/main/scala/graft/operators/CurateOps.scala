package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus CURATION operators — the selection stage a training-data
  * pipeline runs after scoring and dedup: intra-document repetition
  * stats (the Gopher-style repetition quality rule), PII scrubbing,
  * per-source document caps, and the end-to-end keep/drop pipeline that
  * composes quality × language × near-dup-cluster × source-cap into one
  * declarative plan.
  *
  * Reference analog: the span kernel's boilerplate strip is the same
  * keep/drop decision at span granularity (ref crates/core/src/extract —
  * link-density gate); curation lifts it to document granularity.
  *
  * Scale notes:
  *   - repetition stats are a single exchange-free codegen'd projection
  *     (sort + fold inside the row via higher-order functions) — scan
  *     speed, like the other ta_* ops;
  *   - the per-source cap rides the SAME rank-filter shape TopKPerKey
  *     re-plans into two bounded-heap passes (no per-source sort, no
  *     full materialization of hot sources) when GraftExtensions is
  *     installed — a hot source with 10^9 documents costs its scan plus
  *     a k-sized heap, not a sort;
  *   - the dedup-drop side of the pipeline is the CLUSTER output (far
  *     smaller than the corpus: only docs with a near-dup), so the
  *     anti-join broadcasts.
  */
object CurateOps {

  /** Intra-document repetition (Gopher-style duplicate-n-gram rule over
    * word 2-grams): (doc_id, n2 = total 2-grams, d2 = distinct 2-grams,
    * top2 = occurrences of the most frequent 2-gram, rep_q4 =
    * floor(10000 · (n2−d2)/n2) — the duplicated-2-gram fraction in
    * basis points, integer-exact).
    *
    * Shape: the duplicate counting runs INSIDE each row — array_sort +
    * a single linear fold with a (prev, run, max, distinct) struct
    * state — so the operator is a narrow codegen'd projection with zero
    * exchanges, not an explode + two-level groupBy. A 10^12-doc corpus
    * pays one scan.
    */
  def repetition(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id",
        """CASE WHEN size(ws) >= 2
          |  THEN transform(sequence(1, size(ws)-1),
          |         i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))
          |  ELSE array() END AS g2""".stripMargin)
      .selectExpr("doc_id", "CAST(size(g2) AS BIGINT) AS n2",
        """aggregate(array_sort(g2),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'mx', 0L, 'dst', 0L),
          |  (st, x) -> IF(st.prev IS NOT NULL AND x = st.prev,
          |    named_struct('prev', x, 'run', st.run + 1L,
          |                 'mx', GREATEST(st.mx, st.run + 1L), 'dst', st.dst),
          |    named_struct('prev', x, 'run', 1L,
          |                 'mx', GREATEST(st.mx, 1L), 'dst', st.dst + 1L)),
          |  st -> st) AS agg""".stripMargin)
      .select(col("doc_id"), col("n2"),
        col("agg.dst").as("d2"), col("agg.mx").as("top2"))
      .withColumn("rep_q4",
        when(col("n2") > 0, expr("(10000 * (n2 - d2)) div n2"))
          .otherwise(0L))

  /** Email/phone pattern the scrubber redacts. Kept to character-class
    * constructs that Java regex (Spark) and RE2 (DuckDB) evaluate
    * identically — no lookaround, no backslash classes.
    */
  val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]"
  val PhoneRe = "555-[0-9]+"

  /** PII scrub over a deterministically PII-augmented corpus: every
    * doc_id ≡ 0 (mod 3) gets a synthetic email + phone appended (the
    * test corpus itself is PII-free, so the fixture injects what the
    * scrubber must find), then emails/phones are redacted to <EMAIL> /
    * <PHONE>. Output is integer/string-exact: match counts plus the md5
    * of the scrubbed text, so the oracle re-verifies the exact redacted
    * bytes, not just the counts. Single narrow projection, no exchange.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val aug = when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-0"),
        (col("doc_id") % 100).cast("string"), lit(" now")))
      .otherwise(col("text"))
    docs.select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(aug, '$EmailRe', 0)")).cast("long")
          .as("n_email"),
        size(expr(s"regexp_extract_all(aug, '$PhoneRe', 0)")).cast("long")
          .as("n_phone"),
        md5(regexp_replace(regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("scrub_md5"))
  }

  /** Per-source cap: keep the `cap` largest documents of each source
    * (n_chars desc, doc_id asc tiebreak). The rank-filter shape is
    * exactly what TopKPerKey re-plans sort-free; install the extension
    * before calling for the native plan.
    */
  def sourceCap(docs: DataFrame, cap: Int): DataFrame =
    docs.withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= cap)
      .select(col("source"), col("doc_id"), col("n_chars"), col("rnk"))

  /** End-to-end curation: quality score ≥ `minScore`, language == `lang`,
    * drop non-representative near-dup cluster members (every clustered
    * doc except its cluster min), then cap each source at `cap` docs by
    * (score desc, doc_id). One declarative plan: scoring and language ID
    * are exchange-free projections fused into the scan, the dup-drop is
    * a broadcast anti-join against the (small) cluster output, and the
    * cap is the TopKPerKey rank-filter.
    */
  def curate(spark: SparkSession, docs: DataFrame,
             minScore: Long = 70L, lang: String = "en",
             cap: Int = 15): DataFrame = {
    import spark.implicits._
    val q = TextOps.quality(docs).select($"doc_id", $"score")
    val l = TextOps.langId(docs).select($"doc_id", $"pred_lang")
    val dupes = ClusterOps.minhashClusters(spark, docs)
      .filter($"doc_id" =!= $"cluster").select($"doc_id")
    docs.select($"doc_id", $"source")
      .join(q, "doc_id").join(l, "doc_id")
      .filter($"score" >= minScore && $"pred_lang" === lang)
      .join(broadcast(dupes), Seq("doc_id"), "left_anti")
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy($"score".desc, $"doc_id"))
        .cast("long"))
      .filter($"rnk" <= cap)
      .select($"doc_id", $"source", $"score", $"rnk")
  }
}
