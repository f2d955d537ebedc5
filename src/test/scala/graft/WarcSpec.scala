package graft

import graft.extract.Warc
import graft.extract.Warc.Record
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private def rec(uri: String, body: String) =
    Record("response", uri, body.getBytes("UTF-8"))

  test("multi-record round trip preserves payload bytes exactly") {
    val records = Seq(
      rec("http://a/1", "hello world"),
      rec("http://a/2", ""),
      Record("metadata", "http://a/3", Array.tabulate[Byte](257)(_.toByte)))
    val parsed = Warc.parse(Warc.build(records))
    assert(parsed.size == 3)
    parsed.zip(records).foreach { case (p, r) =>
      assert(p.recordType == r.recordType && p.uri == r.uri)
      assert(p.payload.sameElements(r.payload))
    }
  }

  test("payload containing WARC magic and CRLFs frames by Content-Length only") {
    // the classic streaming-parser bug: scanning for the next magic
    // instead of honoring Content-Length
    val evil = "WARC/1.0\r\nWARC-Type: response\r\n\r\nnested!\r\n\r\n"
    val records = Seq(rec("http://t/evil", evil), rec("http://t/next", "after"))
    val parsed = Warc.parse(Warc.build(records))
    assert(parsed.size == 2)
    assert(new String(parsed.head.payload, "UTF-8") == evil)
    assert(parsed(1).uri == "http://t/next")
  }

  test("extra headers are tolerated; header names are case-insensitive") {
    val body = "x"
    val blob = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-TARGET-URI: http://z/9\r\n" +
      "content-length: 1\r\n" +
      "\r\n" + body + "\r\n\r\n").getBytes("UTF-8")
    val parsed = Warc.parse(blob)
    assert(parsed.size == 1 && parsed.head.uri == "http://z/9")
    assert(new String(parsed.head.payload, "UTF-8") == body)
  }

  test("corrupt archives fail structured: bad magic, oversized length, no trailer") {
    val good = Warc.build(Seq(rec("http://x/1", "abc")))
    intercept[IllegalArgumentException] {
      Warc.parse("HARC/1.0\r\n\r\n".getBytes("UTF-8"))
    }
    val oversize = new String(good, "UTF-8")
      .replace("Content-Length: 3", "Content-Length: 9999")
    intercept[IllegalArgumentException] { Warc.parse(oversize.getBytes("UTF-8")) }
    intercept[IllegalArgumentException] {
      Warc.parse(java.util.Arrays.copyOf(good, good.length - 2))
    }
  }

  test("fuzz: garbage and mutated blobs terminate with structured errors") {
    val rng = new scala.util.Random(23)
    val valid = Warc.build(Seq(rec("http://f/1", "alpha"), rec("http://f/2", "beta")))
    for (trial <- 0 until 200) {
      val bytes = trial % 3 match {
        case 0 => Array.fill(rng.nextInt(120) + 1)(rng.nextInt(256).toByte)
        case 1 =>
          val b = valid.clone()
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
          b
        case _ => java.util.Arrays.copyOf(valid, rng.nextInt(valid.length) + 1)
      }
      try Warc.parse(bytes)
      catch { case _: RuntimeException => () }
    }
  }
}
