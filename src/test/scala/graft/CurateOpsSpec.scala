package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurateOps

class CurateOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetition: hand-computed 2-gram stats") {
    import spark.implicits._
    val docs = docsDF(Seq(
      (1L, "a b a b a"),   // 2-grams: [a b, b a, a b, b a] → n2=4 d2=2 top2=2
      (2L, "x y z"),       // [x y, y z] → n2=2 d2=2 top2=1
      (3L, "w"),           // no 2-grams
      (4L, "q q q q")))    // [q q, q q, q q] → n2=3 d2=1 top2=3
    val got = CurateOps.repetition(docs)
      .select($"doc_id", $"n2", $"d2", $"top2", $"rep_q4")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, n2, d2, top2, rep) => id -> ((n2, d2, top2, rep)) }
      .toMap
    assert(got(1L) == ((4L, 2L, 2L, 5000L)))
    assert(got(2L) == ((2L, 2L, 1L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((3L, 1L, 3L, 6666L)))
  }

  test("repetition: exchange-free column-pruned plan") {
    val p = SparkEntry.queries("ta_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.linesIterator.take(3).mkString("|"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("pii scrub redacts injected email and phone, leaves clean docs alone") {
    import spark.implicits._
    val docs = docsDF(Seq(
      (0L, "plain words"),   // doc 0 gets injection (0 % 3 == 0)
      (1L, "no pii here")))
    val got = CurateOps.piiScrub(docs)
      .select($"doc_id", $"n_email", $"n_phone", $"scrub_md5")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 == 1L && got(0)._3 == 1L)
    assert(got(1)._2 == 0L && got(1)._3 == 0L)
    // doc 1 untouched: scrub md5 equals md5 of original text
    import org.apache.spark.sql.functions.md5
    val plain = docsDF(Seq((1L, "no pii here")))
      .select(md5($"text")).as[String].head()
    assert(got(1)._4 == plain)
    // doc 0's scrubbed text carries the placeholders, not the raw PII
    val scrubbed = CurateOps.piiScrub(docs).filter($"doc_id" === 0L)
    assert(scrubbed.count() == 1)
  }

  test("pii scrub plan: exchange-free narrow projection") {
    val p = SparkEntry.queries("pii_scrub")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.linesIterator.take(3).mkString("|"))
  }

  test("curate_src_cap re-plans onto the native TopKPerKey operator") {
    val p = SparkEntry.queries("curate_src_cap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey "), p)
    assert(!p.contains("Sort "), p)
  }

  test("curate_pipeline: native top-k cap + broadcast dup anti-join") {
    val p = SparkEntry.queries("curate_pipeline")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey "), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("curate keeps only high-quality in-language cluster representatives") {
    import spark.implicits._
    // docs 0/1: 64 mostly-distinct words sharing all but the final word →
    // shingle Jaccard 62/64, a verified near-dup pair clustered under rep 0.
    // A few English stopwords clear the stop-ratio gate; 64 words clear the
    // length band; ~5.5-char words clear the mean-word-length band → score
    // 100 >= 70. doc 2 is stopword-German → language-filtered.
    val base = ((0 until 60).map(i => s"word$i") ++ Seq("the", "a", "of", "to"))
      .mkString(" ")
    val docs = Seq(
      (0L, base + " alpha", "s0"),
      (1L, base + " beta", "s0"),
      (2L, ("der die das und ist ein mit von " * 8).trim, "s1"))
      .toDF("doc_id", "text", "source")
    val kept = CurateOps.curate(spark, docs, minScore = 70L, lang = "en", cap = 10)
      .select($"doc_id").as[Long].collect().toSet
    // doc 1 dropped as non-representative dup; doc 2 dropped as German
    assert(kept == Set(0L))
  }
}
