package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step of an LLM pretraining
  * data pipeline: documents of one source shard are concatenated in
  * deterministic (source, doc_id) order into a single token stream that
  * is cut into fixed-capacity training windows; each document is
  * assigned the chunk range it lands in. (The reference's analog is its
  * fixed-budget token-stream assembly — interleaved text+image token
  * sequences built to a deterministic length rule,
  * /root/reference/crates/core/src/inference.rs:185-240 — re-expressed
  * over corpus order instead of one prompt.)
  *
  * The core is a DISTRIBUTED PREFIX SUM, which is where the 100 TB shape
  * matters: the obvious formulation —
  * `sum(toks).over(Window.partitionBy(source).orderBy(doc_id))` —
  * serializes every source through ONE task (a window with an ordering
  * runs single-threaded per partition key), so a 5 TB source becomes a
  * 5 TB task. Instead this is the textbook two-pass scan over ordered
  * shards:
  *
  *   1. a bounded key sample → broadcast (source, doc_id) range
  *      boundaries; every row computes its SHARD by binary search — an
  *      explicit data-derived column, deliberately NOT
  *      spark_partition_id()/TaskContext (task-layout-dependent ids
  *      break under a downstream coalesce, which merges narrow chains
  *      into one task);
  *   2. pass A: per-(shard, source) token TOTALS — one tiny aggregate
  *      (≤ shards + sources rows) collected to the driver, where
  *      exclusive prefixes over shard order become each shard's
  *      starting offset per source;
  *   3. pass B: re-read the same materialized layout (persisted;
  *      hash-partitioned by shard, sorted by (shard, source, doc_id))
  *      and emit a running cumulative sum that RESETS to the broadcast
  *      offset whenever the (shard, source) group key changes — correct
  *      under any task merging, since each group is contiguous within
  *      its partition's iterator.
  *
  * Every shard stays parallel in both passes; the only serial work is
  * the O(shards + sources) offset fold on the driver. The values are
  * shard-count-independent (start_tok depends only on the
  * (source, doc_id) total order), which PackSpec asserts and the DuckDB
  * oracle — free to use the window formulation at its scale — verifies
  * bit-exactly.
  */
object PackOps {

  /** Training-window capacity in tokens. Small enough that the test
    * corpus produces multi-chunk documents and non-trivial boundaries.
    */
  val Capacity = 256

  /** (doc_id, source, toks, start_tok, chunk_first, chunk_last,
    * n_chunks) per document; token count is the whitespace split
    * (DuckDB `len(string_split(text, ' '))`, trailing empties kept).
    * Stream order within a source is doc_id-ascending (ord = doc_id).
    */
  def packChunks(spark: SparkSession, docs: DataFrame,
                 capacity: Int = Capacity, parts: Int = 0): DataFrame = {
    import spark.implicits._
    val toks = docs.select($"doc_id", $"source", $"doc_id".as("ord"),
      size(split($"text", " ", -1)).cast("long").as("toks"))
      .as[graft.pipeline.PrefixSum.Row]
    val cap = capacity.toLong
    graft.pipeline.PrefixSum.exclusive(toks, parts, slotKey = "pack")
      .map { case (id, src, _, tk, start) =>
        (id, src, tk, start, start / cap, (start + tk - 1) / cap)
      }
      .toDF("doc_id", "source", "toks", "start_tok", "chunk_first", "chunk_last")
      .withColumn("n_chunks", $"chunk_last" - $"chunk_first" + lit(1L))
  }
}
