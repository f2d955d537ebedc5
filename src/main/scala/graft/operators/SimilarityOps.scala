package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH sketch (SimHash-for-vectors, Charikar '02) as
  * the scale path (bucketed candidate generation instead of all-pairs).
  *
  * Scale design: the query set is tiny relative to the corpus, so the
  * brute-force path is a BROADCAST join of queries against the corpus —
  * one scan, partial top-k per partition (TakeOrderedAndProject after the
  * window/filter), no corpus shuffle. The LSH path replaces the cross
  * join with a narrow sketch projection + an exchange keyed by sketch.
  *
  * Numeric portability: embeddings are quantized to integers once
  * (q = floor(1000·v), exact for float inputs in any IEEE engine), and
  * every downstream value (dot, norms, sketch bits) is integer-exact, so
  * the DuckDB oracle reproduces results bit-for-bit. The one double used
  * for RANKING (cos = dot/√(na·nb)) is derived from exact integers with a
  * fixed expression shape — identical in both engines; ties broken by id.
  */
object SimilarityOps {

  /** (vec_id, label, q: array<long>, nsq: Σq²) — codegen'd projection. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nsq",
        aggregate(col("q"), lit(0L), (a, x) => a + x * x))

  /** Exact integer dot product of two quantized vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest OTHER vectors. Output (query_id, neighbor_id, rank,
    * dot, na, nb) — rank by (cos desc, neighbor_id) for determinism.
    *
    * Scale shape: queries broadcast against one corpus scan (no corpus
    * shuffle); the top-k runs as a PER-PARTITION bounded heap inside
    * mapPartitions — each scan task emits at most nQueries×k rows — and
    * only that tiny candidate set (partitions × nQueries × k) crosses the
    * wire into the final exact rank. A plain `row_number` window here
    * would funnel the full N×nQueries pair stream into nQueries reducer
    * partitions; the heap keeps the reduction distributed (same output:
    * every partition retains a superset of its global-top-k rows).
    */
  def bruteForceTopK(spark: SparkSession, emb: DataFrame, nQueries: Int,
                     k: Int): DataFrame = {
    import spark.implicits._
    val q = quantized(emb)
    val queries = q.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"q".as("qv"), $"nsq".as("na"))
    val pairs = q.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        dot($"qv", $"q").as("dot"), $"na", $"nsq".as("nb"))
      .withColumn("cos",
        $"dot".cast("double") / sqrt($"na".cast("double") * $"nb"))
    // candidate tuple: (query_id, neighbor_id, dot, na, nb, cos);
    // priority head = WORST retained candidate (lowest cos, then highest
    // neighbor id) so a better arrival evicts it in O(log k)
    val worstFirst: Ordering[(Long, Long, Long, Long, Long, Double)] =
      Ordering.by((c: (Long, Long, Long, Long, Long, Double)) => (-c._6, c._2))
    val partial = pairs.as[(Long, Long, Long, Long, Long, Double)]
      .mapPartitions { it =>
      val heaps = scala.collection.mutable.Map.empty[Long,
        scala.collection.mutable.PriorityQueue[(Long, Long, Long, Long, Long, Double)]]
      it.foreach { c =>
        val h = heaps.getOrElseUpdate(c._1, scala.collection.mutable
          .PriorityQueue.empty[(Long, Long, Long, Long, Long, Double)](worstFirst))
        if (h.size < k) h.enqueue(c)
        else {
          val w = h.head
          if (c._6 > w._6 || (c._6 == w._6 && c._2 < w._2)) {
            h.dequeue(); h.enqueue(c)
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }.toDF("query_id", "neighbor_id", "dot", "na", "nb", "cos")
    // exact final rank over ≤ partitions × nQueries × k surviving rows
    partial
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id")
          .orderBy($"cos".desc, $"neighbor_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank", $"dot", $"na", $"nb")
  }

  val Planes = 16 // sketch bits

  /** Deterministic hyperplane coefficient for (plane p, dim d), in
    * [-1000, 1000]: md5i("p|d") % 2001 - 1000. Same value in DuckDB.
    */
  def planeCoef(p: Int, d: Int): Long = Hashing.md5i(s"$p|$d") % 2001L - 1000L

  /** Random-hyperplane LSH sketch: bit p = [Σ_d coef(p,d)·q_d > 0].
    * Integer-exact (|Σ| ≤ 64·1000·530 < 2^63). Vectors with equal
    * sketches land in the same ANN candidate bucket.
    */
  def lshSketch(spark: SparkSession, emb: DataFrame): DataFrame = {
    graft.functions.LshSketchExpr.register(spark)
    // native codegen'd expression — no typed-map encoder round trip; the
    // sketch column is one static call inside the scan's generated code
    emb.selectExpr("vec_id", "graft_lsh_sketch(embedding) AS sketch")
  }

  /** ANN via LSH buckets: candidate pairs share a sketch; verified with
    * the same exact-integer cosine threshold as the brute-force path.
    */
  def lshCandidatePairs(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val sk = lshSketch(spark, emb)
    val q = quantized(emb).join(sk, "vec_id")
    q.as("a").join(q.as("b"),
        $"a.sketch" === $"b.sketch" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        dot($"a.q", $"b.q").as("dot"), $"a.nsq".as("na"), $"b.nsq".as("nb"))
  }
}
