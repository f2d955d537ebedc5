package graft.pipeline

import graft.pipeline.Extraction.ExtractedRow
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Iceberg-semantics substitute (BASELINE.md note: no Iceberg runtime jar
  * ships offline): an explicit per-bucket lineage-manifest + atomic
  * commit-marker layer over partitioned Parquet.
  *
  * Layout under `outDir`:
  *   data/bucket=<i>/ (parquet)     — extracted rows, one dir per bucket
  *   manifests/bucket-<i>.json      — lineage: the bucket's DATA FILE LIST,
  *                                    counts, bytes, checksum, snapshot id,
  *                                    wall ms (atomic tmp+rename = commit)
  *   _SUCCESS.json                  — job-level marker (idempotent finalize,
  *                                    analog of the reference's SSE
  *                                    `finalize` idempotency —
  *                                    /root/reference/crates/server/src/stream.rs:287-355)
  *
  * Iceberg-fidelity properties:
  *  - MANIFEST-LISTED READS: readers consume exactly the parquet files
  *    named in committed manifests — a bucket directory containing data
  *    but no manifest (a run that died between data write and commit), or
  *    stray files from a dead task attempt, are invisible. No directory
  *    listing governs visibility.
  *  - SNAPSHOT TIME TRAVEL: every manifest carries the snapshot id of the
  *    run that committed it; `readCommitted(asOfSnapshot = s)` reads the
  *    table as of snapshot s. Snapshot ids are monotonic (+1 per
  *    writeResumable run), mirroring the reference's `seq_len decreased`
  *    cache guard (/root/reference/crates/core/src/transformer/cache.rs:204-258).
  *  - SCHEMA VERSIONING: manifests embed `schema_version`; readers REJECT
  *    manifests written by a NEWER schema than they understand
  *    (forward-incompatibility fails loudly, the Iceberg
  *    format-version discipline) and accept older ones.
  *
  * Resume = anti-filter of input buckets against committed manifests; the
  * write uses dynamic partition overwrite so a bucket interrupted between
  * data-append and manifest-commit is rewritten whole on the next run
  * (partial files never double-count).
  *
  * Local FS here; at cluster scale the same protocol runs over any Hadoop
  * FileSystem with atomic rename (HDFS) — the seam is this object.
  */
object TableIO {

  final case class BucketManifest(bucket: Int, doc_count: Long,
      span_count: Long, bytes: Long, wall_ms: Long, span_checksum: Long,
      files: Seq[String])

  val SchemaVersion = 1

  /** Monotonic snapshot id (Iceberg-snapshot analog): 0 before any
    * commit, +1 per successful writeResumable run.
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

  /** Names in `dir` matching prefix/suffix — stream closed promptly
    * (Files.list leaks an fd per call otherwise).
    */
  private def listNames(dir: Path, prefix: String, suffix: String): Seq[String] =
    if (!Files.exists(dir)) Seq.empty
    else Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith(prefix) && n.endsWith(suffix))
        .toSeq
    }

  def committedBuckets(outDir: String): Set[Int] =
    listNames(manifestDir(outDir), "bucket-", ".json")
      .map(_.stripPrefix("bucket-").stripSuffix(".json").toInt).toSet

  private def writeAtomic(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.getParent.resolve(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
  }

  private def manifestJson(m: BucketManifest, snapshot: Long): String =
    s"""{"schema_version":$SchemaVersion,"snapshot":$snapshot,""" +
    s""""bucket":${m.bucket},"doc_count":${m.doc_count},"span_count":${m.span_count},""" +
    s""""bytes":${m.bytes},"wall_ms":${m.wall_ms},"span_checksum":${m.span_checksum},""" +
    m.files.map(f => s""""$f"""").mkString("\"files\":[", ",", "]}")

  /** Parsed committed manifest: (bucket, snapshot, schema_version,
    * data-file relative paths).
    */
  final case class CommittedManifest(bucket: Int, snapshot: Long,
      schemaVersion: Int, files: Seq[String])

  private val SnapRe = "\"snapshot\":(\\d+)".r
  private val VerRe = "\"schema_version\":(\\d+)".r
  private val FilesRe = "\"files\":\\[([^\\]]*)\\]".r

  def committedManifests(outDir: String): Seq[CommittedManifest] =
    listNames(manifestDir(outDir), "bucket-", ".json").sorted.map { name =>
      val bucket = name.stripPrefix("bucket-").stripSuffix(".json").toInt
      val s = Files.readString(manifestDir(outDir).resolve(name))
      val snap = SnapRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
      val ver = VerRe.findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(1)
      val files = FilesRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        .split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty)
      CommittedManifest(bucket, snap, ver, files)
    }

  /** Data files of one just-written bucket, as outDir/data-relative paths. */
  private def bucketFiles(outDir: String, bucket: Int): Seq[String] =
    listNames(Paths.get(outDir, "data", s"bucket=$bucket"), "", ".parquet")
      .sorted.map(n => s"bucket=$bucket/$n")

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
        manifestJson(BucketManifest(b, dc, sc, by, wallMs, ck,
          bucketFiles(outDir, b)), snapshot))
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

  def committedBatches(outDir: String): Set[Long] =
    listNames(manifestDir(outDir), "batch-", ".json")
      .map(_.stripPrefix("batch-").stripSuffix(".json").toLong).toSet

  private def emptyRows(spark: SparkSession): Dataset[ExtractedRow] = {
    import spark.implicits._
    spark.emptyDataset[ExtractedRow]
  }

  /** Read rows of manifest-committed micro-batches only; empty Dataset
    * (with the proper schema) before any batch commits.
    */
  def readCommittedBatches(spark: SparkSession, outDir: String): Dataset[ExtractedRow] = {
    import spark.implicits._
    val done = committedBatches(outDir)
    if (done.isEmpty) return emptyRows(spark)
    spark.read.option("basePath", s"$outDir/data")
      .parquet(done.toSeq.sorted.map(b => s"$outDir/data/batch=$b"): _*)
      .select($"doc_id", $"spans", $"markdown", $"bucket".cast("int").as("bucket"),
              $"span_count", $"bytes", $"checksum")
      .as[ExtractedRow]
  }

  // ------------------------------------------------------------------
  // Compaction + snapshot expiry (the Iceberg rewrite_data_files /
  // expire_snapshots analog). Streaming commits accumulate
  // data/batch=<id>/ dirs forever; compact() rewrites all committed
  // batches into one bucket-clustered snapshot under compacted/snap-<s>/
  // and journals which batches it superseded. Old batch data and
  // manifests stay on disk so readers can TIME TRAVEL to any
  // pre-compaction snapshot, until expireSnapshots() physically removes
  // superseded state (after which, exactly like Iceberg's
  // expire_snapshots, time travel before the compaction is gone).
  // ------------------------------------------------------------------

  final case class Compaction(snapshot: Long, supersededBatches: Seq[Long])

  private def compactionPath(outDir: String, snapshot: Long): Path =
    manifestDir(outDir).resolve(s"compaction-$snapshot.json")
  private val BatchesRe = "\"superseded\":\\[([^\\]]*)\\]".r

  def compactions(outDir: String): Seq[Compaction] =
    listNames(manifestDir(outDir), "compaction-", ".json").map { name =>
      val snap = name.stripPrefix("compaction-").stripSuffix(".json").toLong
      val s = Files.readString(manifestDir(outDir).resolve(name))
      val batches = BatchesRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        .split(',').toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
      Compaction(snap, batches)
    }.sortBy(_.snapshot)

  private def compactedDir(outDir: String, snapshot: Long): Path =
    Paths.get(outDir, "compacted", s"snap-$snapshot")

  /** Rewrite every currently-visible row (latest compaction, if any, plus
    * all non-superseded batches) into ONE bucket-clustered layout under a
    * new snapshot id. Readers observe identical rows before and after;
    * the data-file count drops from O(batches × buckets) to O(buckets).
    * Returns the new snapshot id.
    */
  def compact(spark: SparkSession, outDir: String): Long = {
    require(committedBatches(outDir).nonEmpty || compactions(outDir).nonEmpty,
      s"nothing to compact under $outDir")
    val snapshot = currentSnapshot(outDir) + 1
    val rows = readTable(spark, outDir)
    rows.repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(compactedDir(outDir, snapshot).toString)
    // journal AFTER the data lands: the compaction becomes visible
    // atomically with this manifest write
    val superseded = committedBatches(outDir).toSeq.sorted
    writeAtomic(compactionPath(outDir, snapshot),
      s"""{"schema_version":$SchemaVersion,"snapshot":$snapshot,""" +
      superseded.mkString("\"superseded\":[", ",", "]}"))
    writeAtomic(Paths.get(outDir, "_SUCCESS.json"),
      s"""{"schema_version":$SchemaVersion,"snapshot":$snapshot,""" +
      s""""compacted_batches":${superseded.length}}""")
    snapshot
  }

  /** Table state as of `asOfSnapshot`: the latest compaction at or before
    * it (if any) plus every committed batch it did not supersede. Before
    * any compaction this is exactly [[readCommittedBatches]].
    */
  def readTable(spark: SparkSession, outDir: String,
                asOfSnapshot: Long = Long.MaxValue): Dataset[ExtractedRow] = {
    import spark.implicits._
    val comp = compactions(outDir).filter(_.snapshot <= asOfSnapshot).lastOption
    comp match {
      case None => readCommittedBatches(spark, outDir)
      case Some(c) =>
        val live = committedBatches(outDir).diff(c.supersededBatches.toSet)
        val compacted = spark.read
          .schema(org.apache.spark.sql.Encoders.product[ExtractedRow].schema)
          .option("basePath", compactedDir(outDir, c.snapshot).toString)
          .parquet(compactedDir(outDir, c.snapshot).toString)
          .select($"doc_id", $"spans", $"markdown",
            $"bucket".cast("int").as("bucket"),
            $"span_count", $"bytes", $"checksum")
          .as[ExtractedRow]
        if (live.isEmpty) compacted
        else compacted.unionByName(
          spark.read.option("basePath", s"$outDir/data")
            .parquet(live.toSeq.sorted.map(b => s"$outDir/data/batch=$b"): _*)
            .select($"doc_id", $"spans", $"markdown",
              $"bucket".cast("int").as("bucket"),
              $"span_count", $"bytes", $"checksum")
            .as[ExtractedRow])
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Using.resource(Files.walk(p)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      }
    }

  /** Physically remove state superseded by the LATEST compaction: its
    * superseded batch data dirs + batch manifests, and any OLDER
    * compacted snapshots + their journals. Time travel to snapshots
    * before the latest compaction is no longer possible afterwards —
    * the expire_snapshots contract. Returns the number of batch dirs +
    * old snapshots removed. No-op (0) before any compaction.
    */
  def expireSnapshots(outDir: String): Int = {
    val comps = compactions(outDir)
    if (comps.isEmpty) return 0
    val latest = comps.last
    var removed = 0
    latest.supersededBatches.foreach { b =>
      val dataDir = Paths.get(outDir, "data", s"batch=$b")
      val m = manifestDir(outDir).resolve(s"batch-$b.json")
      if (Files.exists(dataDir) || Files.exists(m)) removed += 1
      deleteRecursively(dataDir)
      Files.deleteIfExists(m)
    }
    comps.dropRight(1).foreach { c =>
      deleteRecursively(compactedDir(outDir, c.snapshot))
      Files.deleteIfExists(compactionPath(outDir, c.snapshot))
      removed += 1
    }
    removed
  }

  /** All data-file paths currently visible through [[readTable]] — used
    * by tests to assert the compaction file-count drop.
    */
  def visibleDataFiles(outDir: String): Seq[String] = {
    val comp = compactions(outDir).lastOption
    val batchFiles = {
      val live = comp match {
        case None => committedBatches(outDir)
        case Some(c) => committedBatches(outDir).diff(c.supersededBatches.toSet)
      }
      live.toSeq.sorted.flatMap { b =>
        val root = Paths.get(outDir, "data", s"batch=$b")
        if (!Files.exists(root)) Seq.empty
        else Using.resource(Files.walk(root)) { st =>
          st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
            .map(_.toString).toSeq
        }
      }
    }
    val compFiles = comp.toSeq.flatMap { c =>
      val root = compactedDir(outDir, c.snapshot)
      if (!Files.exists(root)) Seq.empty
      else Using.resource(Files.walk(root)) { st =>
        st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(_.toString).toSeq
      }
    }
    batchFiles ++ compFiles
  }

  /** Read back only manifest-committed data, as of `asOfSnapshot`
    * (default: latest). The reader consumes the manifests' FILE LISTS —
    * uncommitted bucket dirs, partial writes, and buckets committed after
    * the requested snapshot are all invisible. Fails loudly on manifests
    * written by a newer schema version.
    */
  def readCommitted(spark: SparkSession, outDir: String,
                    asOfSnapshot: Long = Long.MaxValue): Dataset[ExtractedRow] = {
    import spark.implicits._
    val manifests = committedManifests(outDir)
    manifests.filter(_.schemaVersion > SchemaVersion).foreach { m =>
      throw new IllegalStateException(
        s"bucket ${m.bucket} manifest has schema_version ${m.schemaVersion} " +
        s"> reader's $SchemaVersion — upgrade the reader")
    }
    val files = manifests.filter(_.snapshot <= asOfSnapshot)
      .flatMap(_.files).map(f => s"$outDir/data/$f")
    if (files.isEmpty) return emptyRows(spark)
    spark.read.option("basePath", s"$outDir/data")
      .parquet(files: _*)
      .select($"doc_id", $"spans", $"markdown", $"bucket".cast("int").as("bucket"),
              $"span_count", $"bytes", $"checksum")
      .as[ExtractedRow]
  }
}
