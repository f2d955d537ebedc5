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
}
