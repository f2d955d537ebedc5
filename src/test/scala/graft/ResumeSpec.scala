package graft

import graft.corpus.CorpusDerive
import graft.pipeline.{Extraction, TableIO}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Kill-and-resume tests over the manifest + commit-marker layer
  * (SURVEY.md §7.4 risk 3): a run that dies mid-write must resume from the
  * last committed bucket and converge to the exact single-run output.
  */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"
  private val Buckets = 8

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-resume").toString
    d
  }

  private def rows = Extraction.extractRows(CorpusDerive.derive(spark, sf), Buckets)

  private def readAll(out: String) = {
    TableIO.readCommitted(spark, out)
      .collect().sortBy(_.doc_id).map(r => (r.doc_id, r.spans, r.markdown)).toSeq
  }

  test("clean run commits all buckets; rerun is an idempotent no-op") {
    val out = tmpDir()
    val written = TableIO.writeResumable(rows, out)
    assert(written == Buckets)
    assert(TableIO.committedBuckets(out) == (0 until Buckets).toSet)
    val again = TableIO.writeResumable(rows, out)
    assert(again == 0, "fully-committed rerun must write nothing")
  }

  test("interrupted run (simulated kill after partial commit) resumes to identical output") {
    val full = tmpDir()
    TableIO.writeResumable(rows, full)
    val expected = readAll(full)

    // simulate a killed run: full data write happened for some buckets but
    // only 3 manifests were committed; one bucket even has partial data
    // with NO manifest (died between append and commit)
    val killed = tmpDir()
    TableIO.writeResumable(rows, killed)
    val mdir = Path.of(killed, "manifests")
    val all = Files.list(mdir).iterator().asScala.toSeq.sortBy(_.toString)
    all.drop(3).foreach(Files.delete) // un-commit 5 buckets
    assert(TableIO.committedBuckets(killed).size == 3)

    val resumed = TableIO.writeResumable(rows, killed)
    assert(resumed == Buckets - 3)
    assert(TableIO.committedBuckets(killed).size == Buckets)
    assert(readAll(killed) == expected, "resumed output differs from single-run output")
  }

  test("snapshot ids are monotonic; schema_version stamped") {
    val out = tmpDir()
    assert(TableIO.currentSnapshot(out) == 0L)
    TableIO.writeResumable(rows, out)
    assert(TableIO.currentSnapshot(out) == 1L)
    TableIO.writeResumable(rows, out) // idempotent no-op still advances commit
    assert(TableIO.currentSnapshot(out) == 2L)
    val m = Files.readString(Path.of(out, "manifests", "bucket-0.json"))
    assert(m.contains("\"schema_version\":1") && m.contains("\"snapshot\":1"))
  }

  test("reads are manifest-file-listed: stray files + uncommitted buckets invisible") {
    val out = tmpDir()
    TableIO.writeResumable(rows, out)
    val before = readAll(out)
    // a stray parquet from a dead task attempt inside a COMMITTED bucket
    // dir must be invisible (it is not in the manifest's file list) ...
    val strayDir = Path.of(out, "data", "bucket=0")
    val real = Files.list(strayDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(real, strayDir.resolve("part-stray-attempt.c000.parquet"))
    // ... as must a whole data dir whose manifest was never committed
    Files.delete(Path.of(out, "manifests", "bucket-3.json"))
    val after = readAll(out)
    assert(after == before.filterNot { case (id, _, _) =>
      Extraction.bucketOf(id, Buckets) == 3 })
    assert(after.nonEmpty && after.size < before.size)
  }

  test("snapshot time travel: asOfSnapshot reads the table as of that commit") {
    val out = tmpDir()
    // snapshot 1: only buckets 0-2 committed (simulate by filtering input)
    import spark.implicits._
    val firstRows = rows.filter(r => r.bucket < 3)
    TableIO.writeResumable(firstRows, out)
    val snap1 = TableIO.currentSnapshot(out)
    val atSnap1 = readAll(out)
    // snapshot 2: the rest
    TableIO.writeResumable(rows, out)
    assert(TableIO.currentSnapshot(out) == snap1 + 1)
    val latest = readAll(out)
    assert(latest.size > atSnap1.size)
    val travel = TableIO.readCommitted(spark, out, asOfSnapshot = snap1)
      .collect().sortBy(_.doc_id).map(r => (r.doc_id, r.spans, r.markdown)).toSeq
    assert(travel == atSnap1)
    // as of snapshot 0: empty table, correct schema
    assert(TableIO.readCommitted(spark, out, asOfSnapshot = 0L).count() == 0L)
  }

  test("reader rejects manifests from a newer schema version") {
    val out = tmpDir()
    TableIO.writeResumable(rows, out)
    val m = Path.of(out, "manifests", "bucket-1.json")
    Files.writeString(m,
      Files.readString(m).replace("\"schema_version\":1", "\"schema_version\":99"))
    val e = intercept[IllegalStateException](readAll(out))
    assert(e.getMessage.contains("schema_version 99"))
  }

  test("empty table reads: no manifests -> empty Dataset with schema, not a crash") {
    val out = tmpDir()
    assert(TableIO.readCommitted(spark, out).count() == 0L)
    assert(TableIO.readCommittedBatches(spark, out).count() == 0L)
    assert(TableIO.readCommitted(spark, out).schema.fieldNames.contains("doc_id"))
  }

  test("compaction: identical rows, fewer files, time travel; expiry drops superseded state") {
    import spark.implicits._
    val out = tmpDir()
    // three streaming micro-batches (split by doc_id mod 3)
    val all = rows
    (0 until 3).foreach { i =>
      val part = all.filter(r =>
        java.lang.Long.parseLong(r.doc_id.stripPrefix("d")) % 3 == i)
      assert(TableIO.appendBatchIdempotent(part, out, i.toLong))
    }
    val before = TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq
    val filesBefore = TableIO.visibleDataFiles(out).size
    assert(before.nonEmpty && filesBefore >= 3)

    val snap = TableIO.compact(spark, out)
    // equality after compaction
    val after = TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq
    assert(after == before, "compaction changed visible rows")
    // file-count drop: O(batches×buckets) → O(buckets)
    val filesAfter = TableIO.visibleDataFiles(out).size
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")
    // time travel to the pre-compaction snapshot still sees batch layout
    val travel = TableIO.readTable(spark, out, asOfSnapshot = snap - 1)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq
    assert(travel == before)

    // a post-compaction batch stays visible alongside the compacted base
    val extra = all.filter(r =>
      java.lang.Long.parseLong(r.doc_id.stripPrefix("d")) % 3 == 0)
    assert(TableIO.appendBatchIdempotent(extra, out, 99L))
    val withExtra = TableIO.readTable(spark, out).count()
    assert(withExtra == before.size + extra.count())

    // expiry removes superseded batch dirs; visible rows unchanged
    val removed = TableIO.expireSnapshots(out)
    assert(removed >= 3)
    (0 until 3).foreach { i =>
      assert(!Files.exists(Path.of(out, "data", s"batch=$i")), s"batch $i survived expiry")
    }
    assert(TableIO.readTable(spark, out).count() == withExtra)
  }

  test("binpack: only small batches fold; big batch untouched; compose + full compact") {
    import spark.implicits._
    val out = tmpDir()
    val all = rows.collect().toSeq
    // batch 0: "big" (most rows); batches 1..3: small tails
    val big = all.filterNot(r =>
      java.lang.Long.parseLong(r.doc_id.stripPrefix("d")) % 10 < 3)
    assert(TableIO.appendBatchIdempotent(big.toDS(), out, 0L))
    (1 to 3).foreach { i =>
      val part = all.filter(r =>
        java.lang.Long.parseLong(r.doc_id.stripPrefix("d")) % 10 == i - 1)
      assert(TableIO.appendBatchIdempotent(part.toDS(), out, i.toLong))
    }
    val before = TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq
    val bigBytes = Files.walk(Path.of(out, "data", "batch=0"))
      .filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    val smallMax = Files.walk(Path.of(out, "data", "batch=1"))
      .filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum() * 3
    val threshold = math.min(bigBytes, smallMax)
    assert(threshold > 0 && bigBytes >= threshold)

    val snap = TableIO.compactSmall(spark, out, threshold)
    assert(snap.nonEmpty)
    // the big batch dir is untouched; small ones are superseded
    assert(Files.exists(Path.of(out, "data", "batch=0")))
    val comp = TableIO.compactions(out).last
    assert(comp.supersededBatches.toSet == Set(1L, 2L, 3L))
    assert(comp.supersededSnapshots.isEmpty)
    // identical visible rows; batch 0 still read from its own dir
    val after = TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq
    assert(after == before, "binpack changed visible rows")
    assert(TableIO.visibleDataFiles(out).exists(_.contains("batch=0")))
    // a second small batch wave + binpack composes: two visible snapshots
    val extra = all.filter(r =>
      java.lang.Long.parseLong(r.doc_id.stripPrefix("d")) % 10 == 3)
    assert(TableIO.appendBatchIdempotent(extra.toDS(), out, 4L))
    assert(TableIO.appendBatchIdempotent(
      spark.emptyDataset[graft.pipeline.Extraction.ExtractedRow], out, 5L))
    val snap2 = TableIO.compactSmall(spark, out, threshold)
    assert(snap2.nonEmpty && TableIO.visibleCompactions(out).size == 2)
    val withExtra = TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq
    assert(withExtra == (before ++ extra.map(r => (r.doc_id, r.spans, r.markdown))).sortBy(_._1))
    // full compact folds both binpack snapshots + the big batch into one
    val full = TableIO.compact(spark, out)
    assert(TableIO.visibleCompactions(out).map(_.snapshot) == Seq(full))
    assert(TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq == withExtra)
    // expiry removes every superseded batch dir and snapshot; rows intact
    TableIO.expireSnapshots(out)
    (0 to 5).foreach { i =>
      assert(!Files.exists(Path.of(out, "data", s"batch=$i")), s"batch $i survived")
    }
    assert(TableIO.readTable(spark, out)
      .collect().map(r => (r.doc_id, r.spans, r.markdown)).sortBy(_._1).toSeq == withExtra)
  }

  test("schema evolution: add column, old snapshots keep old shape, " +
       "nulls for old rows, compaction preserves, expiry keeps values") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = tmpDir()
    val idNum = expr("CAST(substring(doc_id, 2) AS BIGINT)")
    // v1: half the docs under the base schema
    assert(TableIO.appendBatchDf(rows.filter(idNum % 2 === 0).toDF(), out, 0L))
    assert(TableIO.currentTableSchemaVersion(out) == 1)
    val preSnap = TableIO.currentSnapshot(out)
    val evoSnap = TableIO.evolveAddColumn(out, "lang", "string")
    assert(evoSnap > preSnap)
    assert(TableIO.currentTableSchemaVersion(out) == 2)
    // double-evolve of the same name rejected; bad DDL rejected atomically
    assertThrows[IllegalArgumentException](
      TableIO.evolveAddColumn(out, "lang", "string"))
    intercept[Exception](TableIO.evolveAddColumn(out, "x", "no_such_type"))
    assert(TableIO.currentTableSchemaVersion(out) == 2, "failed evolve must not commit")
    // post-evolution writers must carry the full current schema
    assertThrows[IllegalArgumentException](
      TableIO.appendBatchDf(rows.limit(1).toDF(), out, 9L))
    val v2 = rows.filter(idNum % 2 === 1).toDF()
      .withColumn("lang", when(idNum % 3 === 0, lit("en")).otherwise(lit("xx")))
    assert(TableIO.appendBatchDf(v2, out, 1L))
    // time travel: pre-evolution snapshot has the old shape, even though
    // newer files physically contain the column
    assert(!TableIO.readTableDf(spark, out, asOfSnapshot = preSnap)
      .columns.contains("lang"))
    assert(TableIO.tableSchemaAt(out, preSnap).fieldNames.toSeq ==
           TableIO.tableSchemaAt(out, Long.MaxValue).fieldNames.toSeq.init)
    // latest read: old rows are NULL, new rows carry written values
    val latest = TableIO.readTableDf(spark, out)
    val (nullLang, enLang) = (
      latest.filter($"lang".isNull).count(),
      latest.filter($"lang" === "en").count())
    assert(nullLang == rows.filter(idNum % 2 === 0).count())
    assert(enLang > 0)
    val totalBefore = latest.count()
    val langTotals = latest.groupBy(coalesce($"lang", lit("none")).as("l"))
      .count().as[(String, Long)].collect().sortBy(_._1).toSeq
    // compaction rewrites under the latest schema — column + values survive
    TableIO.compact(spark, out)
    val afterC = TableIO.readTableDf(spark, out)
    assert(afterC.count() == totalBefore)
    assert(afterC.groupBy(coalesce($"lang", lit("none")).as("l"))
      .count().as[(String, Long)].collect().sortBy(_._1).toSeq == langTotals)
    // expiry drops superseded batch state; values still intact
    assert(TableIO.expireSnapshots(out) > 0)
    assert(TableIO.readTableDf(spark, out)
      .groupBy(coalesce($"lang", lit("none")).as("l"))
      .count().as[(String, Long)].collect().sortBy(_._1).toSeq == langTotals)
  }

  test("manifest stats: doc/span counts and checksum match recomputation") {
    import spark.implicits._
    val out = tmpDir()
    TableIO.writeResumable(rows, out)
    val back = TableIO.readCommitted(spark, out)
    val totalDocs = back.count()
    assert(totalDocs == spark.read.parquet(s"$sf/documents.parquet").count())
    // committed manifests sum to the same totals
    val manifests = spark.read.json(s"$out/manifests/*.json")
    val mDocs = manifests.agg(org.apache.spark.sql.functions.sum("doc_count")).as[Long].head()
    assert(mDocs == totalDocs)
  }

  test("manifest blooms: point reads skip buckets, never rows; legacy manifests read conservatively") {
    val out = tmpDir()
    TableIO.writeResumable(rows, out)
    // every manifest carries the full word vector
    TableIO.committedManifests(out).foreach(m =>
      assert(m.bloom.length == graft.operators.SketchOps.BloomWords))
    // existing ids: exact rows back, strictly fewer buckets than total
    val ids = Seq("d0000000000", "d0000000007", "d0000000042")
    val (got, read, total) = TableIO.readCommittedPrunedByIds(spark, out, ids)
    assert(got.collect().map(_.doc_id).sorted.toSeq == ids)
    assert(read < total && total == Buckets)
    // the never-written id: only an (unlikely) false positive costs reads
    val (none, readMiss, _) =
      TableIO.readCommittedPrunedByIds(spark, out, Seq("d9999999998"))
    assert(none.count() == 0 && readMiss <= 1)
    // a bucket's own id must hit its bucket (no false negatives ever)
    val m0 = TableIO.committedManifests(out).head
    val anyDoc = TableIO.readCommitted(spark, out)
      .filter(org.apache.spark.sql.functions.col("bucket") === m0.bucket)
      .head().doc_id
    assert(graft.operators.SketchOps.bloomMaybeContains(m0.bloom, anyDoc))
    // legacy manifest (bloom field stripped) is conservatively always read
    val mPath = java.nio.file.Paths.get(out, "manifests", s"bucket-${m0.bucket}.json")
    val stripped = Files.readString(mPath)
      .replaceAll("\"bloom\":\\[[^\\]]*\\],", "")
    Files.writeString(mPath, stripped)
    val (_, readLegacy, totalLegacy) =
      TableIO.readCommittedPrunedByIds(spark, out, Seq("d9999999998"))
    assert(readLegacy >= 1 && totalLegacy == Buckets)
  }
}
