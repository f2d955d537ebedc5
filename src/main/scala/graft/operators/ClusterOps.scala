package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: connected components over the verified
  * pair graph, so a dedup pipeline can keep exactly one representative
  * per duplicate cluster — the step after pair discovery that a corpus
  * pipeline actually acts on (drop all but the cluster min).
  *
  * Pair emission alone is not actionable at scale: near-dup relations
  * are not transitive, and the MaxBucket/prefix star-caps deliberately
  * route flood buckets through a representative, so the "duplicate set
  * of a document" is only defined on the CONNECTED COMPONENT of the
  * pair graph. This operator closes that gap.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
  * and Beyond", SoCC 2014) — the published shuffle-bounded CC algorithm:
  * every round is two hash aggregations + a self-equijoin over the edge
  * set, edge count never grows above the input edge count, and the round
  * count is logarithmic in the largest component diameter. No vertex
  * ever materializes its full component (contrast label propagation,
  * where a hot label's posting list concentrates on one reducer): the
  * star operations only ever group a node's direct NEIGHBORS, whose
  * count the upstream skew caps already bound. That is the 100 TB shape.
  *
  * Reference analog: the decode loop's grouping of grounded regions into
  * per-document ordered clusters before emission
  * (ref crates/core/src/extract/mod.rs — span grouping), and the same
  * bounded-structure discipline as the KV cache
  * (ref crates/core/src/transformer/cache.rs:78-118).
  *
  * Iteration mechanics (Spark-specific, load-bearing):
  *   - each round's edge set is cut off from its lineage with an EAGER
  *     localCheckpoint. Persist alone is NOT enough: the logical plan
  *     still nests (each round references the previous edge set four
  *     times), so analysis/plan-string work grows ~4^rounds and the
  *     driver livelocks around round ~20 — measured, not theoretical.
  *     The checkpoint replaces the subtree with a materialized leaf, so
  *     every round plans O(1) work. On a real cluster with executor
  *     churn, swap in reliable `checkpoint` against the checkpoint dir —
  *     same shape, durable blocks;
  *   - convergence = two consecutive rounds with identical (count,
  *     xor-of-row-hash) checksums — order-insensitive multiset identity,
  *     one cheap aggregate action per round on the materialized set;
  *   - non-convergence within `maxRounds` fails loudly (require) rather
  *     than returning a partial clustering.
  */
object ClusterOps {

  /** Connected components of the undirected graph given as (doc_a,
    * doc_b) pairs. Returns one row per node that appears in `pairs`:
    * (doc_id, cluster, csize) with cluster = min doc_id of the node's
    * component and csize = component node count. Nodes with no pairs are
    * singletons by definition and are NOT emitted (at corpus scale the
    * pair graph is far smaller than the corpus; emitting the identity
    * row for every clean document would dwarf the signal).
    */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
                          maxRounds: Int = 32): DataFrame = {
    import spark.implicits._
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"u", $"v")), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    // LAZY checkpoint + count: the count() is the action that
    // materializes the checkpoint, so each round costs ONE pass over the
    // edge set (the old shape ran an eager checkpoint job plus a
    // count+xxhash checksum aggregation — two). The count is the
    // convergence fast path; the checksum runs only when counts stall
    // (typically once, on the final round) to confirm the edge SET is
    // stable, not merely its size.
    var edges = pairs
      .select($"doc_a".cast("long").as("u"), $"doc_b".cast("long").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(false)
    var prevN = edges.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // LARGE-STAR: for each node u, m = min(Γ(u) ∪ {u}); every STRICTLY
      // LARGER neighbor re-attaches to m. Directed view sends each edge
      // both ways so Γ(u) is one groupBy.
      val dir = edges.union(edges.select($"v".as("u"), $"u".as("v")))
      val mins = dir.groupBy($"u").agg(min($"v").as("mn"))
      val large = dir.join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), least($"mn", col("u")).as("v"))
        .filter($"u" =!= $"v")
        .distinct()
      // SMALL-STAR: orient each edge (hi → lo); for each hi, m = min of
      // its smaller neighbors; hi and all its other small neighbors
      // re-attach to m.
      val o = large.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()
      val mins2 = o.groupBy($"u").agg(min($"v").as("m"))
      val small = o.join(mins2, "u")
        .filter($"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v"))
        .union(mins2.select($"u", $"m".as("v")))
        .distinct()
        .localCheckpoint(false)
      val nCur = small.count() // materializes the checkpoint — one pass
      converged = nCur == prevN && checksum(edges) == checksum(small)
      prevN = nCur
      edges = small // prior round's checkpoint blocks free via ContextCleaner
      round += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds")
    // Converged state: a forest of stars (u → component min). The center
    // itself carries no outgoing edge — add its identity row.
    val assign = edges.select($"u".as("doc_id"), $"v".as("cluster"))
      .union(edges.select($"v".as("doc_id"), $"v".as("cluster")).distinct())
    val sizes = assign.groupBy($"cluster").agg(count(lit(1)).as("csize"))
    assign.join(sizes, "cluster").select($"doc_id", $"cluster", $"csize")
  }

  /** Driver-verify entry: cluster the verified MinHash+LSH near-dup
    * pairs of `documents` ([[DedupOps.minhashPairs]], J ≥ 0.7 with the
    * MaxBucket star-cap). The flood case composes: an N-copy flood's
    * linear star arrives here as N−1 pairs and leaves as ONE cluster of
    * size N — pair linearity and cluster completeness at once.
    */
  def minhashClusters(spark: SparkSession, docs: DataFrame): DataFrame =
    connectedComponents(spark,
      DedupOps.minhashPairs(spark, docs).select("doc_a", "doc_b"))
}
