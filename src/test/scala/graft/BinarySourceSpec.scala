package graft

import graft.operators.MediaOps
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** S1 source coverage: media payloads round-trip through the
  * `binaryFile` DataSource (the lake-side analog of the reference's
  * per-image file scan, cli/app.rs:95-101) and feed the decode kernel.
  */
class BinarySourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  test("binaryFile scan reads media payloads and joins the decode stub") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bin")
    val docs = Seq((2L, "x"), (4L, "y")).toDF("doc_id", "text")
    val items = MediaOps.mediaItems(spark, docs).collect()
    items.foreach { it =>
      Files.write(dir.resolve(it.media_ref.replaceAll("[:/]+", "_") + ".bin"),
        it.content)
    }
    val scanned = spark.read.format("binaryFile")
      .load(dir.toString)
      .select($"path", $"length", $"content")
      .as[(String, Long, Array[Byte])].collect()
    assert(scanned.length == items.length)
    assert(scanned.forall(_._2 == 16L))
    val byBytes = items.map(i => i.content.toSeq -> i.media_ref).toMap
    // every scanned payload maps back to exactly one media item
    assert(scanned.flatMap(s => byBytes.get(s._3.toSeq)).toSet ==
      items.map(_.media_ref).toSet)
    scanned.foreach(s => Files.deleteIfExists(Paths.get(new java.net.URI(s._1))))
  }
}
