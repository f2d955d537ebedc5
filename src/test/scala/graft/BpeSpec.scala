package graft

import graft.operators.BpeOps
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  test("learnMerges: hand-checkable tiny corpus") {
    // "aaa"×2: pairs (a,a) occur 4× → merge; then (aa,a) occurs 2× → merge;
    // then (aaa) is a single token per word — no pair twice, stop.
    assert(BpeOps.learnMerges(Seq("aaa" -> 2L), 5) ==
      Vector(("a", "a"), ("aa", "a")))
    // singleton pair never merges (needs count ≥ 2)
    assert(BpeOps.learnMerges(Seq("ab" -> 1L), 5) == Vector.empty)
    // deterministic tie-break: (a,b) and (c,d) both count 2 → lexicographically
    // smallest pair wins first
    val m = BpeOps.learnMerges(Seq("ab" -> 2L, "cd" -> 2L), 1)
    assert(m == Vector(("a", "b")))
  }

  test("applyMerge is left-to-right non-overlapping (the replace() contract)") {
    assert(BpeOps.applyMerge(Vector("a", "a", "a"), ("a", "a")) ==
      Vector("aa", "a"))
    assert(BpeOps.applyMerge(Vector("a", "a", "a", "a"), ("a", "a")) ==
      Vector("aa", "aa"))
  }

  /** Textbook BPE encode: repeatedly merge the lowest-rank applicable
    * pair (all its occurrences, left-to-right) until none applies.
    */
  private def textbookEncode(word: String,
      merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var toks = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val present = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))))
      if (present.isEmpty) done = true
      else toks = BpeOps.applyMerge(toks, merges(present.min))
    }
    toks
  }

  test("rank-order encode ≡ textbook min-rank loop (fixture ranks, many words)") {
    val merges = BpeOps.fixtureMerges
    val rng = new scala.util.Random(42)
    val seedWords = BpeOps.SeedText.split(" ").distinct
    val words = seedWords.toIndexedSeq ++
      (0 until 300).map(_ => (0 until (1 + rng.nextInt(12)))
        .map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    words.foreach { w =>
      assert(BpeOps.encodeWord(w, merges) == textbookEncode(w, merges),
        s"divergence on '$w'")
    }
  }

  test("fixture tokenizer: deterministic, compressive on the seed, lossless") {
    val merges = BpeOps.fixtureMerges
    assert(merges.nonEmpty && merges.length <= BpeOps.FixtureNumMerges)
    assert(merges == BpeOps.learnMerges(
      BpeOps.seedWordCounts(BpeOps.SeedText), BpeOps.FixtureNumMerges))
    // vocab numbering: a..z then merge products in rank order
    assert(BpeOps.fixtureVocab("a") == 0 && BpeOps.fixtureVocab("z") == 25)
    assert(BpeOps.fixtureVocab(merges.head._1 + merges.head._2) == 26)
    // frequent seed words actually compress (that's what the ranks are for)
    assert(BpeOps.encodeWord("the", merges).length < 3)
    assert(BpeOps.encodeWord("stream", merges).length < 6)
    // decode is exact concatenation — lossless for any word, in or out
    // of the seed register
    Seq("the", "stream", "zzz", "qqxj", "partition").foreach { w =>
      assert(BpeOps.encodeWord(w, merges).mkString == w)
    }
  }

  test("corpus-learned encode on real docs: lossless, compressive, bounded driver state") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = BpeOps.corpusWordCounts(docs, BpeOps.LearnVocabCap)
    assert(wc.length <= BpeOps.LearnVocabCap)
    val out = BpeOps.learnAndEncode(spark, docs)
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._5 == 1L), "decode∘encode must be identity on every doc")
    assert(out.forall(_._4 >= 0L), "fp is a non-negative FpMod residue")
    val (words, toks) = (out.map(_._2).sum, out.map(_._3).sum)
    val chars = docs.select(org.apache.spark.sql.functions
      .sum(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.regexp_replace($"text", " ", ""))))
      .as[Long].head()
    assert(toks < chars, "learned merges must compress below char-level")
    assert(toks >= words, "BPE token count is bounded below by word count")
  }
}
