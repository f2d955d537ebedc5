package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions:
  *  - every query takes (spark, sfDir) and reads the driver-generated
  *    parquet tables under sfDir (TESTDATA.md);
  *  - aggregate outputs derived from doubles are made *integer-exact*
  *    (cents / counts) so the DuckDB oracle hash-compare is bit-stable;
  *  - ext_* queries run the full extraction pipeline (corpus derivation →
  *    salt → repartitionByRange → mapPartitions kernel) and are checked by
  *    DuckDB oracles that recompute expected outputs from documents.parquet
  *    via the derivation rules (graft.corpus.CorpusDerive).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Extracted spans, exploded: (doc_id, kind, text, media_ref, order). */
  private def extractedSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.corpus.CorpusDerive.derive(s, dir)
    graft.pipeline.Extraction.pipeline(docs)
      .select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.kind".as("kind"), $"s.text".as("text"),
              $"s.media_ref".as("media_ref"), $"s.order".as("order"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    extractedSpans(spark, "/root/testdata/sf0.001")
      .groupBy("kind").agg(count(lit(1)).as("cnt"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction pipeline (north rule core) ----
    "ext_kind_counts" -> ((s, dir) =>
      extractedSpans(s, dir).groupBy("kind").agg(count(lit(1)).as("cnt"))),

    // THE north-rule gate: full span-sequence equality (kind, text,
    // media_ref, order) for every doc, end-to-end through the salted +
    // range-repartitioned mapPartitions pipeline.
    "ext_spans_full" -> ((s, dir) => {
      import s.implicits._
      extractedSpans(s, dir)
        .select($"doc_id", $"kind", $"text", $"media_ref",
                $"order".cast("long").as("ord"))
    }),

    // Rendered page markdown (analog of result.mmd equality,
    // /root/reference/crates/core/tests/baseline.rs:700-705).
    "ext_markdown" -> ((s, dir) => {
      import s.implicits._
      val docs = graft.corpus.CorpusDerive.derive(s, dir)
      graft.pipeline.Extraction.pipeline(docs)
        .select($"doc_id", $"markdown")
    }),

    "ext_headings" -> ((s, dir) => {
      import s.implicits._
      extractedSpans(s, dir).filter($"order" === 0)
        .select($"doc_id", $"text")
    }),

    "ext_doc_span_counts" -> ((s, dir) => {
      import s.implicits._
      extractedSpans(s, dir).groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_spans"),
             max($"order").cast("long").as("max_order"))
    }),

    "ext_media_refs" -> ((s, dir) => {
      import s.implicits._
      extractedSpans(s, dir).filter($"kind" === "figure")
        .select($"doc_id", $"media_ref", $"order".cast("long").as("ord"))
    }),

    // ---- relational operators over the TPC-H-ish tables (SURVEY §2.4/2.6) ----
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_returnflag", $"l_linestatus").agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("sum_price_cents"),
        sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000).cast("long"))
          .as("sum_disc_price_c4"),
        count(lit(1)).as("n_rows"))
    }),

    "q6_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(sum(round($"l_extendedprice" * $"l_discount" * 10000).cast("long"))
               .as("revenue_c4"),
             count(lit(1)).as("n_rows"))
    }),

    // ---- text analysis over documents (training-data ops) ----
    "ta_tokens" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_tokens"),
          length($"text").cast("long").as("n_chars_q"))
    }),

    "dedup_exact" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5($"text").as("fp"))
        .agg(count(lit(1)).as("n"), min($"doc_id").as("keep_id"))
        .agg(count(lit(1)).as("n_unique"),
             sum($"n" - 1).cast("long").as("n_dup_rows"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ext_kind_counts" ->
      """SELECT 'heading' AS kind, count(*)::BIGINT AS cnt FROM documents
        |UNION ALL
        |SELECT 'paragraph', CAST(sum(CAST(ceil(greatest(len(string_split(text,' '))-3,0)/12.0) AS BIGINT)) AS BIGINT) FROM documents
        |UNION ALL
        |SELECT 'table', count(*)::BIGINT FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 'figure', ((SELECT count(*) FROM documents WHERE doc_id % 2 = 0) + (SELECT count(*) FROM documents WHERE doc_id % 4 = 0))::BIGINT""".stripMargin,

    "ext_spans_full" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text,' ') AS words,
        |         CAST(ceil(greatest(len(string_split(text,' '))-3,0)/12.0) AS BIGINT) AS p
        |  FROM documents)
        |SELECT printf('d%010d', doc_id) AS doc_id, 'heading' AS kind,
        |       '# ' || array_to_string(list_slice(words,1,3),' ') AS text,
        |       '' AS media_ref, 0::BIGINT AS ord
        |FROM w
        |UNION ALL
        |SELECT printf('d%010d', doc_id), 'paragraph',
        |       array_to_string(list_slice(words, 4+(i-1)*12, 3+i*12), ' '),
        |       '', i::BIGINT
        |FROM (SELECT doc_id, words, unnest(generate_series(1, p)) AS i FROM w)
        |UNION ALL
        |SELECT printf('d%010d', doc_id), 'table',
        |       '| k | v |' || chr(10) || '| r' || doc_id || ' | c' || doc_id || ' |',
        |       '', (1 + p)::BIGINT
        |FROM w WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT printf('d%010d', doc_id), 'figure', '',
        |       'img://' || doc_id || '/0',
        |       (1 + p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
        |FROM w WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT printf('d%010d', doc_id), 'figure', '',
        |       'img://' || doc_id || '/1',
        |       (2 + p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
        |FROM w WHERE doc_id % 4 = 0""".stripMargin,

    "ext_markdown" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text,' ') AS words,
        |         CAST(ceil(greatest(len(string_split(text,' '))-3,0)/12.0) AS BIGINT) AS p
        |  FROM documents)
        |SELECT printf('d%010d', doc_id) AS doc_id,
        |  array_to_string(
        |    ['# ' || array_to_string(list_slice(words,1,3),' ')]
        |    || list_transform(generate_series(1, p),
        |         i -> array_to_string(list_slice(words, 4+(i-1)*12, 3+i*12), ' '))
        |    || (CASE WHEN doc_id % 3 = 0
        |         THEN ['| k | v |' || chr(10) || '| r' || doc_id || ' | c' || doc_id || ' |']
        |         ELSE []::VARCHAR[] END)
        |    || (CASE WHEN doc_id % 2 = 0 THEN ['![](img://' || doc_id || '/0)']
        |         ELSE []::VARCHAR[] END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN ['![](img://' || doc_id || '/1)']
        |         ELSE []::VARCHAR[] END),
        |    chr(10) || chr(10)) AS markdown
        |FROM w""".stripMargin,

    "ext_headings" ->
      """SELECT printf('d%010d', doc_id) AS doc_id,
        |       '# ' || array_to_string(list_slice(string_split(text,' '), 1, 3), ' ') AS text
        |FROM documents""".stripMargin,

    "ext_doc_span_counts" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         CAST(ceil(greatest(len(string_split(text,' '))-3,0)/12.0) AS BIGINT) AS p
        |  FROM documents)
        |SELECT printf('d%010d', doc_id) AS doc_id,
        |       (1 + p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
        |          + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
        |          + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_spans,
        |       (p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
        |          + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
        |          + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS max_order
        |FROM w""".stripMargin,

    "ext_media_refs" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         CAST(ceil(greatest(len(string_split(text,' '))-3,0)/12.0) AS BIGINT) AS p
        |  FROM documents)
        |SELECT printf('d%010d', doc_id) AS doc_id,
        |       'img://' || doc_id || '/0' AS media_ref,
        |       (1 + p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS ord
        |FROM w WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT printf('d%010d', doc_id),
        |       'img://' || doc_id || '/1',
        |       (2 + p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
        |FROM w WHERE doc_id % 4 = 0""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_c4,
        |       count(*)::BIGINT AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q6_filter" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4,
        |       count(*)::BIGINT AS n_rows
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "ta_tokens" ->
      """SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tokens,
        |       length(text)::BIGINT AS n_chars_q
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """WITH g AS (
        |  SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keep_id
        |  FROM documents GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_unique, sum(n - 1)::BIGINT AS n_dup_rows FROM g""".stripMargin,
  )
}
