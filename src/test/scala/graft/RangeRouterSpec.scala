package graft

import graft.corpus.CorpusDerive
import graft.pipeline.{Extraction, RangeRouter}
import org.scalatest.funsuite.AnyFunSuite

/** Router invariants: exact placement, true range clustering, and
  * pipeline output equivalence (the router is performance-only).
  */
class RangeRouterSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  test("hashTokens: bijection onto partitions for several n") {
    for (n <- Seq(1, 4, 7, 32, 256)) {
      val t = RangeRouter.hashTokens(n)
      assert(t.length == n && t.distinct.length == n)
    }
  }

  test("bucket: boundary binary search matches linear scan") {
    val bounds = Array((1L, "b"), (3L, "a"), (3L, "m"))
    def linear(k: RangeRouter.Key): Int =
      bounds.count(b => b._1 < k._1 || (b._1 == k._1 && b._2 <= k._2))
    for (k <- Seq((0L, "z"), (1L, "a"), (1L, "b"), (2L, "x"), (3L, "a"),
                  (3L, "z"), (9L, "")))
      assert(RangeRouter.bucket(bounds, k) == linear(k), s"key $k")
  }

  test("pipeline: partitions hold disjoint, ordered key intervals") {
    import spark.implicits._
    val docs = CorpusDerive.derive(spark, "/root/testdata/sf0.001")
    val out = Extraction.pipeline(docs, shufflePartitions = 8)
    val intervals = out.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val keys = it.map(d => RangeRouter.key(d.doc_id, 64)).toArray
      if (keys.isEmpty) Iterator.empty
      else Iterator.single((pid, keys.min, keys.max))
    }.collect().sortBy(_._1)
    assert(intervals.nonEmpty)
    // consecutive non-empty partitions: max(i) < min(i+1) in key order
    val ord = Ordering.Tuple2(Ordering.Long, Ordering.String)
    intervals.sliding(2).foreach {
      case Array((p1, _, max1), (p2, min2, _)) =>
        assert(ord.lt(max1, min2), s"overlap between partitions $p1 and $p2")
      case _ =>
    }
  }

  test("sampleKeys: driver collect bounded at any split count; boundaries stay balanced") {
    import spark.implicits._
    val docs = CorpusDerive.derive(spark, "/root/testdata/sf0.001")
      .repartition(200) // many small splits — the 100×-scale shape
    // budget 100 with 200 partitions forces the second-level reduction
    val tight = Extraction.sampleKeys(docs, saltBuckets = 64, budget = 100)
    assert(tight.length <= math.max(2 * 100, Extraction.SampleGroups * Extraction.MinQuota),
      s"collected ${tight.length}")
    assert(tight.nonEmpty)
    // budget 1000: first-level path, still bounded by 2×budget
    val loose = Extraction.sampleKeys(docs, saltBuckets = 64, budget = 1000)
    assert(loose.length <= 2 * 1000, s"collected ${loose.length}")
    // boundary quality from the REDUCED sample: route every doc and check
    // no range bucket exceeds 4× the mean load (approximate quantiles are
    // fine; placement is exact regardless)
    val n = 16
    val bounds = RangeRouter.boundaries(tight, n)
    val ids = docs.map(_.doc_id).collect()
    val sizes = ids.groupBy(id => RangeRouter.bucket(bounds, RangeRouter.key(id, 64)))
      .values.map(_.length)
    val mean = ids.length.toDouble / n
    assert(sizes.max <= 4 * mean, s"max bucket ${sizes.max} vs mean $mean")
  }

  test("pipeline output == plain kernel output (router is placement-only)") {
    import spark.implicits._
    val docs = CorpusDerive.derive(spark, "/root/testdata/sf0.001")
    val viaPipeline = Extraction.pipeline(docs, shufflePartitions = 8)
      .collect().map(d => (d.doc_id, d.spans, d.markdown)).toSet
    val viaKernel = Extraction.extractDs(docs)
      .collect().map(d => (d.doc_id, d.spans, d.markdown)).toSet
    assert(viaPipeline == viaKernel)
  }
}
