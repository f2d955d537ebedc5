package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

class ClusterOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  /** brute-force union-find ground truth */
  private def ufClusters(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress to true minima: roots are not guaranteed min by rank-less
    // union above, so relabel every node by the min of its component
    val byRoot = parent.keys.toSeq.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    ClusterOps.connectedComponents(spark, df)
      .as[(Long, Long, Long)].collect()
      .map { case (d, c, s) => d -> (c, s) }.toMap
  }

  test("chain collapses to one component labeled by its min") {
    val n = 17L
    val got = run((1L until n).map(i => (i, i + 1)))
    assert(got.keySet == (1L to n).toSet)
    assert(got.values.forall { case (c, s) => c == 1L && s == n })
  }

  test("disjoint components keep separate min labels and sizes") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 33L))
    val got = run(pairs)
    assert(got(10L) == (10L, 3L) && got(12L) == (10L, 3L))
    assert(got(20L) == (20L, 2L) && got(21L) == (20L, 2L))
    assert(got(33L) == (30L, 4L))
  }

  test("random graphs match union-find ground truth") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      val truth = ufClusters(pairs)
      val sizes = truth.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
      val got = run(pairs)
      assert(got.keySet == truth.keySet)
      truth.foreach { case (node, comp) =>
        assert(got(node) == (comp, sizes(comp)), s"node $node trial $trial")
      }
    }
  }

  test("flood docs: linear star pairs become ONE cluster of full size") {
    import spark.implicits._
    val n = 200
    val docs = (0L until n.toLong)
      .map(i => (i, "identical flood document body repeated verbatim in every copy"))
      .toDF("doc_id", "text")
    val out = ClusterOps.minhashClusters(spark, docs)
      .as[(Long, Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall { case (_, c, s) => c == 0L && s == n.toLong })
  }

  test("duplicate and reversed pair rows do not distort sizes") {
    val got = run(Seq((5L, 6L), (6L, 5L), (5L, 6L), (6L, 7L)))
    assert(got == Map(5L -> ((5L, 3L)), 6L -> ((5L, 3L)), 7L -> ((5L, 3L))))
  }
}
