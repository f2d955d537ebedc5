package graft.pipeline

import graft.pipeline.Extraction.ExtractedRow
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-semantics substitute (BASELINE.md note: no Iceberg runtime jar
  * ships offline): an explicit per-bucket lineage-manifest + atomic
  * commit-marker layer over partitioned Parquet.
  *
  * Layout under `outDir`:
  *   data/bucket=<i>/ (parquet)     — extracted rows, one dir per bucket
  *   manifests/bucket-<i>.json      — lineage: counts, bytes, checksum,
  *                                    wall ms (atomic tmp+rename = commit)
  *   _SUCCESS.json                  — job-level marker (idempotent finalize,
  *                                    analog of the reference's SSE
  *                                    `finalize` idempotency —
  *                                    /root/reference/crates/server/src/stream.rs:287-355)
  *
  * Resume = anti-filter of input buckets against committed manifests; the
  * write uses dynamic partition overwrite so a bucket interrupted between
  * data-append and manifest-commit is rewritten whole on the next run
  * (partial files never double-count). Monotonic-commit discipline mirrors
  * the reference's KV-cache `seq_len decreased` guard
  * (/root/reference/crates/core/src/transformer/cache.rs:204-258).
  *
  * Local FS here; at cluster scale the same protocol runs over any Hadoop
  * FileSystem with atomic rename (HDFS) — the seam is this object.
  */
object TableIO {

  final case class BucketManifest(bucket: Int, doc_count: Long,
      span_count: Long, bytes: Long, wall_ms: Long, span_checksum: Long)

  val SchemaVersion = 1

  /** Monotonic snapshot id (Iceberg-snapshot analog): 0 before any
    * commit, +1 per successful writeResumable run. The monotonic guard
    * mirrors the reference's `seq_len decreased` cache invariant.
    */
  def currentSnapshot(outDir: String): Long = {
    val p = Paths.get(outDir, "_SUCCESS.json")
    if (!Files.exists(p)) 0L
    else {
      val s = Files.readString(p)
      "\"snapshot\":(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    }
  }

  private def manifestDir(outDir: String): Path = Paths.get(outDir, "manifests")
  private def manifestPath(outDir: String, bucket: Int): Path =
    manifestDir(outDir).resolve(s"bucket-$bucket.json")

  def committedBuckets(outDir: String): Set[Int] = {
    val dir = manifestDir(outDir)
    if (!Files.exists(dir)) Set.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("bucket-") && s.endsWith(".json") =>
        s.stripPrefix("bucket-").stripSuffix(".json").toInt }
      .toSet
  }

  private def writeAtomic(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.getParent.resolve(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
  }

  private def manifestJson(m: BucketManifest, snapshot: Long): String =
    s"""{"schema_version":$SchemaVersion,"snapshot":$snapshot,""" +
    s""""bucket":${m.bucket},"doc_count":${m.doc_count},"span_count":${m.span_count},""" +
    s""""bytes":${m.bytes},"wall_ms":${m.wall_ms},"span_checksum":${m.span_checksum}}"""

  /** Resumable bucketed write. Returns the number of buckets written this
    * run (0 on a fully-committed rerun — idempotent no-op).
    */
  def writeResumable(rows: Dataset[ExtractedRow], outDir: String): Int = {
    val spark = rows.sparkSession
    import spark.implicits._
    val done = committedBuckets(outDir)
    val todo = if (done.isEmpty) rows
               else rows.filter(!$"bucket".isin(done.toSeq: _*))
    val t0 = System.nanoTime()
    // Pass 1 — the extraction itself: dynamic partition overwrite replaces
    // only buckets present in `todo`; committed buckets' data is untouched.
    // (No .cache(): at 100 TB the stats pass below re-reads the *written*
    // parquet with column pruning instead of holding the corpus in memory.)
    // Cluster by bucket BEFORE partitionBy: without it every task opens a
    // writer per bucket (tasks × buckets tiny files — a small-file
    // explosion at scale); clustered, each task writes whole buckets.
    todo
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(s"$outDir/data")
    // Pass 2 — lineage stats from the written output, pruned to 4 small
    // columns (no markdown/spans IO), restricted to newly-written buckets.
    val stats = spark.read.parquet(s"$outDir/data")
      .filter(if (done.isEmpty) lit(true) else !$"bucket".isin(done.toSeq: _*))
      .groupBy($"bucket".cast("int").as("bucket")).agg(
        count(lit(1)).as("doc_count"),
        sum($"span_count").cast("long").as("span_count"),
        sum($"bytes").cast("long").as("bytes"),
        // order-insensitive streamable checksum over per-doc FNV checksums
        expr("bit_xor(checksum)").as("span_checksum"))
      .as[(Int, Long, Long, Long, Long)].collect()
    val wallMs = (System.nanoTime() - t0) / 1000000
    val snapshot = currentSnapshot(outDir) + 1
    stats.foreach { case (b, dc, sc, by, ck) =>
      writeAtomic(manifestPath(outDir, b),
        manifestJson(BucketManifest(b, dc, sc, by, wallMs, ck), snapshot))
    }
    writeAtomic(Paths.get(outDir, "_SUCCESS.json"),
      s"""{"schema_version":$SchemaVersion,"snapshot":$snapshot,""" +
      s""""buckets_committed":${committedBuckets(outDir).size},""" +
      s""""last_run_buckets":${stats.length},"last_run_wall_ms":$wallMs}""")
    stats.length
  }

  /** Streaming ingestion: idempotent per-micro-batch commit. A replayed
    * batch (restart between data write and manifest commit, or source
    * offset replay) is detected by its batch manifest and re-written
    * WHOLE via overwrite — never double-appended. This is the standard
    * foreachBatch exactly-once recipe: checkpointed source offsets +
    * idempotent batch-keyed sink.
    *
    * Layout: data/batch=<id>/bucket=<i>/ + manifests/batch-<id>.json.
    * Returns false when the batch was already committed (no-op replay).
    */
  def appendBatchIdempotent(rows: Dataset[ExtractedRow], outDir: String,
                            batchId: Long): Boolean = {
    val spark = rows.sparkSession
    import spark.implicits._
    val mpath = manifestDir(outDir).resolve(s"batch-$batchId.json")
    if (Files.exists(mpath)) return false
    rows.repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite) // replay-safe: replace, never append
      .partitionBy("bucket")
      .parquet(s"$outDir/data/batch=$batchId")
    // explicit schema: an empty micro-batch writes a file-less dir, which
    // would fail schema inference
    val (nd, ns) = spark.read
      .schema(org.apache.spark.sql.Encoders.product[ExtractedRow].schema)
      .parquet(s"$outDir/data/batch=$batchId")
      .agg(count(lit(1)), coalesce(sum($"span_count").cast("long"), lit(0L)))
      .as[(Long, Long)].head()
    writeAtomic(mpath,
      s"""{"schema_version":$SchemaVersion,"batch":$batchId,"doc_count":$nd,"span_count":$ns}""")
    true
  }

  def committedBatches(outDir: String): Set[Long] = {
    val dir = manifestDir(outDir)
    if (!Files.exists(dir)) Set.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("batch-") && s.endsWith(".json") =>
        s.stripPrefix("batch-").stripSuffix(".json").toLong }
      .toSet
  }

  /** Read rows of manifest-committed micro-batches only. */
  def readCommittedBatches(spark: SparkSession, outDir: String): Dataset[ExtractedRow] = {
    import spark.implicits._
    val done = committedBatches(outDir)
    spark.read.option("basePath", s"$outDir/data")
      .parquet(done.toSeq.map(b => s"$outDir/data/batch=$b"): _*)
      .select($"doc_id", $"spans", $"markdown", $"bucket".cast("int").as("bucket"),
              $"span_count", $"bytes", $"checksum")
      .as[ExtractedRow]
  }

  /** Read back only manifest-committed buckets (manifest-listed reads —
    * partial, uncommitted bucket dirs are invisible to readers).
    */
  def readCommitted(spark: SparkSession, outDir: String): Dataset[ExtractedRow] = {
    import spark.implicits._
    val done = committedBuckets(outDir)
    val df = spark.read.parquet(s"$outDir/data")
    df.filter($"bucket".isin(done.toSeq: _*))
      .select($"doc_id", $"spans", $"markdown", $"bucket".cast("int").as("bucket"),
              $"span_count", $"bytes", $"checksum")
      .as[ExtractedRow]
  }
}
