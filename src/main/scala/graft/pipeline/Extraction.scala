package graft.pipeline

import graft.extract.Kernel
import graft.schema.{Doc, ExtractedDoc, ExtractedSpan}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark wiring of the extraction kernel (SURVEY.md §7.1 module 4).
  *
  * Dataset-only, no RDDs: read → salt column for skewed hosts/doc-size
  * buckets → repartitionByRange(salt, doc_id) for shuffle balance →
  * mapPartitions(Kernel.extract) → (optionally) resumable bucketed write
  * via [[TableIO]].
  *
  * Scale notes (designed for 1000 executors / 100 TB, tested on local[32]):
  *  - The kernel is a narrow per-row map: zero cross-row dependencies,
  *    matching the reference's per-image rayon `par_iter`
  *    (/root/reference/crates/core/src/model/mod.rs:840-862).
  *  - The ONLY shuffle is the explicit rebalance. Hot hosts / long-tail doc
  *    sizes make raw input splits skewed; the salt term spreads any hot
  *    doc_id range uniformly while the range partitioner keeps output
  *    clustered for downstream locality.
  *  - AQE stays on; shuffle partition count is a parameter sized so a
  *    partition's docs fit executor memory (north rule: explicit, not
  *    implicit, skew handling).
  */
object Extraction {

  /** Flat output row carrying bucket + stats for the resumable write. */
  final case class ExtractedRow(
      doc_id: String,
      spans: Seq[ExtractedSpan],
      markdown: String,
      bucket: Int,
      span_count: Int,
      bytes: Long,
      checksum: Long
  )

  /** Narrow extraction: kernel over each partition's docs in a tight loop
    * (batch-of-tiles analog, SURVEY.md O15). No shuffle.
    */
  def extractDs(docs: Dataset[Doc]): Dataset[ExtractedDoc] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ExtractedDoc]
    docs.mapPartitions(_.map(Kernel.extract))
  }

  /** Live task-side metrics — the analog of the reference's injected
    * progress callback + bench recorder (model/mod.rs:96,1405-1407;
    * benchmark.rs:83-176): named LongAccumulators updated inside the
    * kernel loop, visible on the driver while the job runs (and in the
    * Spark UI / listener bus on a real cluster).
    *
    * OBSERVABILITY-ONLY: Spark guarantees exactly-once accumulator
    * updates only in actions; updates inside a transformation (this
    * mapPartitions) are at-least-once under task retries / speculative
    * execution on a real cluster. Use [[metricsRow]] — an aggregation
    * over the data itself — for any value that must be exact (the
    * ext_metrics hash gate does).
    */
  final case class Metrics(docs: org.apache.spark.util.LongAccumulator,
                           spansIn: org.apache.spark.util.LongAccumulator,
                           spansOut: org.apache.spark.util.LongAccumulator) {
    def dropped: Long = spansIn.value - spansOut.value
  }

  def metrics(spark: SparkSession): Metrics = Metrics(
    spark.sparkContext.longAccumulator("graft.docs"),
    spark.sparkContext.longAccumulator("graft.spans_in"),
    spark.sparkContext.longAccumulator("graft.spans_out"))

  /** extractDs with live accumulator updates per document. */
  def extractDsWithMetrics(docs: Dataset[Doc], m: Metrics): Dataset[ExtractedDoc] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ExtractedDoc]
    docs.mapPartitions(_.map { d =>
      val out = Kernel.extract(d)
      m.docs.add(1L)
      m.spansIn.add(d.spans.size.toLong)
      m.spansOut.add(out.spans.size.toLong)
      out
    })
  }

  /** Exact metric totals as a plan-level aggregation over the data
    * itself — retry-safe (exactly-once) where the accumulator surface
    * is at-least-once. Runs the kernel once in the same narrow pass and
    * folds (docs, spans_in, spans_out) map-side; only three longs per
    * partition cross the wire. The optional accumulators are updated in
    * the same loop so the live-progress surface still works.
    */
  def metricsRow(docs: Dataset[Doc],
                 m: Option[Metrics] = None): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      var n = 0L; var si = 0L; var so = 0L
      it.foreach { d =>
        val out = Kernel.extract(d)
        n += 1L; si += d.spans.size.toLong; so += out.spans.size.toLong
        m.foreach { mm =>
          mm.docs.add(1L); mm.spansIn.add(d.spans.size.toLong)
          mm.spansOut.add(out.spans.size.toLong)
        }
      }
      Iterator.single((n, si, so))
    }.toDF("n", "si", "so")
      .agg(org.apache.spark.sql.functions.sum($"n").cast("long").as("n_docs"),
           org.apache.spark.sql.functions.sum($"si").cast("long").as("spans_in"),
           org.apache.spark.sql.functions.sum($"so").cast("long").as("spans_out"))
      .withColumn("dropped", $"spans_in" - $"spans_out")
  }

  /** Full pipeline with explicit salt + range rebalance (north rule).
    *
    * Order: kernel FIRST (narrow, on size-balanced input splits), THEN
    * salt + range placement for the clustered write. Extraction shrinks
    * docs (boilerplate stripped, markup dropped), so the shuffle moves
    * fewer bytes than shuffling raw input — and hot oversized raw docs
    * are already reduced before they cross the wire. The salt term
    * spreads any hot doc_id range; the range layout keeps output
    * clustered by (salt, doc_id) for downstream locality.
    *
    * Range placement uses [[RangeRouter]] (sketch boundaries from a
    * narrow key-only pass, then ONE hash shuffle with exact partition
    * routing) instead of `repartitionByRange`, whose RangePartitioner
    * sampling re-executes the entire upstream — including the extraction
    * kernel — a second time. At 100 TB that double scan is the
    * difference between one pass and two.
    */
  /** Hard ceiling on keys the boundary sketch collects to the driver —
    * independent of the input split count. Spark's own RangePartitioner
    * applies the same discipline (`sampleSizePerPartition` against a
    * total budget); without it, ~800k splits of a 100 TB input × 128
    * keys each would put ~100M tuples (multi-GB) on the driver.
    */
  val SampleBudget = 100000
  /** Second-level reduction width when split count × quota would still
    * exceed the budget (quota already floored at its minimum).
    */
  val SampleGroups = 64
  /** Per-partition sample floor: even at extreme split counts every
    * split contributes a few keys so no region is invisible to the
    * sketch.
    */
  val MinQuota = 8

  /** Bounded boundary sample: per-partition reservoir with quota
    * max(MinQuota, budget/numPartitions); when the floor makes the
    * first-level total exceed 2×budget (split count > budget/MinQuota·2),
    * a narrow coalesce + second reservoir reduces it below the budget
    * BEFORE the collect. Driver receives ≤ max(2·budget,
    * SampleGroups·MinQuota) keys, ever. A reservoir-of-reservoirs is not
    * an exactly uniform sample, but boundaries only need approximate
    * quantiles — placement stays EXACT either way (buckets are computed
    * per row; boundary quality only affects balance).
    */
  def sampleKeys(docs: Dataset[Doc], saltBuckets: Int,
                 budget: Int = SampleBudget): Array[RangeRouter.Key] =
    sampleKeysWith(docs, (_: Doc).doc_id, saltBuckets, budget)

  /** [[sampleKeys]] over any document type, keyed by `idOf`. */
  def sampleKeysWith[T](docs: Dataset[T], idOf: T => String, saltBuckets: Int,
                        budget: Int = SampleBudget): Array[RangeRouter.Key] = {
    import docs.sparkSession.implicits._
    val numParts = math.max(1, docs.rdd.getNumPartitions)
    val quota = math.max(MinQuota, budget / numParts)
    val firstLevel = docs.mapPartitions { it =>
      RangeRouter.reservoir(
        it.map(d => RangeRouter.key(idOf(d), saltBuckets)), quota)
    }
    if (numParts.toLong * quota <= 2L * budget) firstLevel.collect()
    else {
      val groupQuota = math.max(MinQuota, budget / SampleGroups)
      firstLevel.coalesce(SampleGroups)
        .mapPartitions(it => RangeRouter.reservoir(it, groupQuota))
        .collect()
    }
  }

  def pipeline(docs: Dataset[Doc], shufflePartitions: Int = 0,
               saltBuckets: Int = 64): Dataset[ExtractedDoc] =
    pipelineWith(docs, (_: Doc).doc_id, Kernel.extractSpans,
      shufflePartitions, saltBuckets)

  /** The span pipeline over raw HTML documents: the [[graft.extract.Html]]
    * streaming tokenizer + link-density boilerplate strip is the kernel,
    * everything else (salt, sketch-routed range placement, single
    * exchange, post-shuffle markdown render) is shared with [[pipeline]].
    * This is the north star's "boilerplate stripping over a streaming DOM
    * tokenizer" as a DISTRIBUTED path, not just a per-row kernel.
    */
  /** HTML → ordered spans: the [[graft.extract.Html]] kernel's block
    * stream mapped into the span model (shared by the batch pipeline,
    * the streaming path, and the driver queries).
    */
  def htmlSpans(html: String): IndexedSeq[ExtractedSpan] =
    graft.extract.Html.extract(html).zipWithIndex.map { case (b, i) =>
      ExtractedSpan(b.kind, b.text, b.mediaRef, i)
    }

  def pipelineHtml(docs: Dataset[(String, String)], shufflePartitions: Int = 0,
                   saltBuckets: Int = 64): Dataset[ExtractedDoc] =
    pipelineWith(docs, (_: (String, String))._1,
      (d: (String, String)) => htmlSpans(d._2),
      shufflePartitions, saltBuckets)

  /** Pipeline stage names for [[pipelineWith]]'s partial-execution gate,
    * in execution order. The reference debugs its decoder by running layer
    * sub-ranges via `DEEPSEEK_OCR_LAYER_SLICE` (ref
    * crates/core/src/model/decoder.rs:104-117); the Spark analog truncates
    * the extraction pipeline after a named stage:
    *  - `scan`: derivation only — ids pass through, kernel never runs, no
    *    exchange (isolates scan+derive cost / input health);
    *  - `kernel`: narrow kernel applied, NO exchange (isolates kernel cost
    *    from shuffle cost — the per-layer timing analog);
    *  - `route`: kernel + the one sketch-routed exchange, markdown NOT
    *    rendered (isolates shuffle placement);
    *  - `all` (default): the full pipeline.
    * Controlled by the session conf `spark.graft.stages` so a debugging
    * run truncates WITHOUT code changes, exactly like the reference's
    * env-var slice.
    */
  val Stages: Seq[String] = Seq("scan", "kernel", "route", "all")
  val StagesConf = "spark.graft.stages"

  /** Generic pipeline body: any document type, any narrow span kernel.
    * The plan shape is IDENTICAL for every instantiation — kernel first
    * (narrow), one sketch-routed exchange, markdown rendered post-shuffle
    * (PlanShapeSpec pins it). Honors [[StagesConf]] (partial execution).
    */
  def pipelineWith[T](docs: Dataset[T], idOf: T => String,
                      kernel: T => IndexedSeq[ExtractedSpan],
                      shufflePartitions: Int = 0,
                      saltBuckets: Int = 64): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stage = spark.conf.get(StagesConf, "all")
    require(Stages.contains(stage),
      s"$StagesConf must be one of ${Stages.mkString("/")}, got '$stage'")
    val n = if (shufflePartitions > 0) shufflePartitions
            else spark.sessionState.conf.numShufflePartitions
    implicit val outEnc = org.apache.spark.sql.Encoders.product[ExtractedDoc]
    if (stage == "scan")
      return docs.mapPartitions(_.map(d => ExtractedDoc(idOf(d), Seq.empty, "")))
    if (stage == "kernel")
      return docs.mapPartitions(_.map(d => ExtractedDoc(idOf(d), kernel(d), "")))
    // narrow key-only sketch pass: derivation runs, kernel does NOT;
    // driver collect bounded by SampleBudget regardless of split count
    val keys = sampleKeysWith(docs, idOf, saltBuckets)
    val bounds = RangeRouter.boundaries(keys, n)
    val tokens = RangeRouter.hashTokens(n)
    val bBounds = spark.sparkContext.broadcast(bounds)
    val routed = docs
      .mapPartitions(_.map { d =>
        val id = idOf(d)
        val k = RangeRouter.key(id, saltBuckets)
        (tokens(RangeRouter.bucket(bBounds.value, k)), id, kernel(d))
      })
      .toDF("route", "doc_id", "spans")
      .repartition(n, $"route")
      .drop("route")
      .as[(String, Seq[ExtractedSpan])]
    // markdown rendered post-shuffle: pure function of spans, and twice
    // the wire bytes if shuffled
    routed.mapPartitions(_.map { case (id, spans) =>
      ExtractedDoc(id, spans,
        if (stage == "route") "" else Kernel.renderMarkdown(spans))
    })
  }

  /** Extraction + bucket/stats columns for [[TableIO.writeResumable]].
    * `buckets` is the resume granularity: bucket = xxhash-style stable hash
    * of doc_id mod buckets, computed in the kernel so it survives any
    * repartitioning.
    */
  def extractRows(docs: Dataset[Doc], buckets: Int): Dataset[ExtractedRow] =
    extractRowsWith(docs, (_: Doc).doc_id, Kernel.extractSpans, buckets)

  /** [[extractRows]] over any document type and span kernel (the
    * pipelineWith analog for the resumable-write row shape).
    */
  def extractRowsWith[T](docs: Dataset[T], idOf: T => String,
                         kernel: T => IndexedSeq[ExtractedSpan],
                         buckets: Int): Dataset[ExtractedRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ExtractedRow]
    docs.mapPartitions(_.map { doc =>
      val id = idOf(doc)
      val spans = kernel(doc)
      val md = Kernel.renderMarkdown(spans)
      ExtractedRow(id, spans, md, bucketOf(id, buckets), spans.size,
        md.length.toLong, Kernel.checksum(ExtractedDoc(id, spans, md)))
    })
  }

  /** Stable, deterministic, engine-portable bucket assignment:
    * md5i(doc_id) % buckets (positive 60-bit hash — see
    * [[graft.functions.Hashing]]), so the DuckDB oracle can recompute
    * bucket membership for the resumable-write round-trip query.
    */
  def bucketOf(docId: String, buckets: Int): Int =
    (graft.functions.Hashing.md5i(docId) % buckets).toInt

  /** RANGE-clustered bucket: monotone in the numeric doc id, so each
    * bucket owns a contiguous id interval and the manifests' min/max
    * bounds become an effective skipping index
    * ([[TableIO.readCommittedPruned]]). Hash buckets spread every id
    * range across ALL buckets — resume-friendly but unprunable; this is
    * the layout trade Iceberg exposes as partition-spec choice.
    */
  def rangeBucketOf(docId: String, buckets: Int, maxId: Long): Int = {
    val id = docId.slice(1, 11).toLong
    math.min(buckets - 1, (id * buckets / (maxId + 1)).toInt)
  }

  /** [[extractRows]] with range-clustered buckets (see [[rangeBucketOf]];
    * `maxId` from a one-column pre-scan or catalog stats).
    */
  def extractRowsClustered(docs: Dataset[Doc], buckets: Int,
                           maxId: Long): Dataset[ExtractedRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ExtractedRow]
    docs.mapPartitions(_.map { doc =>
      val spans = Kernel.extractSpans(doc)
      val md = Kernel.renderMarkdown(spans)
      ExtractedRow(doc.doc_id, spans, md,
        rangeBucketOf(doc.doc_id, buckets, maxId), spans.size,
        md.length.toLong,
        Kernel.checksum(ExtractedDoc(doc.doc_id, spans, md)))
    })
  }
}
