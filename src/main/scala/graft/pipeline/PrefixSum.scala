package graft.pipeline

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE PREFIX SUM over rows ordered by (group, ord) —
  * the shared engine under sequence packing ([[graft.operators.PackOps]])
  * and token-budget corpus mixing ([[graft.operators.MixOps]]).
  *
  * Why not `sum(w).over(Window.partitionBy(group).orderBy(ord))`: an
  * ordered window runs single-threaded per partition key, so a 5 TB
  * group becomes one 5 TB task. This is the textbook two-pass scan
  * instead:
  *
  *   1. a bounded reservoir of (group, ord) keys → broadcast range
  *      boundaries; every row computes its SHARD by binary search — an
  *      explicit data-derived column, deliberately NOT
  *      spark_partition_id()/TaskContext (task-layout-dependent ids
  *      silently change under a downstream coalesce, which merges
  *      narrow chains into one task — PackSpec regression-guards this);
  *   2. pass A: per-(shard, group) totals — a tiny aggregate
  *      (≤ shards + groups rows) collected to the driver, folded into
  *      exclusive per-shard offsets;
  *   3. pass B: re-read the same persisted layout (hash-partitioned by
  *      shard, sorted by (shard, group, ord, id)) emitting a running
  *      sum that RESETS to the broadcast offset on every
  *      (shard, group) change — correct under any task merging, since
  *      each group is contiguous within its partition's iterator.
  *
  * Results are shard-count-independent: `start` depends only on the
  * (group, ord, id) total order.
  */
object PrefixSum {

  type Row = (Long, String, Long, Long)         // (id, group, ord, weight)
  type Out = (Long, String, Long, Long, Long)   // ... + start (exclusive)

  private type SKey = (String, Long) // (group, ord)
  private val skeyOrd: Ordering[SKey] =
    Ordering.Tuple2(Ordering.String, Ordering.Long)

  private def boundariesOf(sample: Array[SKey], n: Int): Array[SKey] = {
    if (sample.isEmpty || n <= 1) return Array.empty
    val sorted = sample.sorted(skeyOrd)
    (1 until n).map { i =>
      // Long quantile index: i * length overflows Int once the
      // sample × shard-count product passes 2^31
      sorted(math.min(sorted.length - 1L, i.toLong * sorted.length / n).toInt)
    }.distinct.toArray
  }

  private def shardOf(bounds: Array[SKey], k: SKey): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (skeyOrd.lteq(bounds(mid), k)) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Driver-sample budget: same discipline as [[Extraction.SampleBudget]]
    * — the collect must stay bounded regardless of input split count
    * (~800k splits × an uncapped 128-key reservoir would put ~100M
    * tuples on the driver).
    */
  val SampleBudget = 100000
  val SampleGroups = 64
  val MinQuota = 8

  /** `slotKey` names the persist slot for the sharded layout (one live
    * cache per caller — see [[graft.operators.DedupOps.persistSlot]]).
    */
  def exclusive(rows: Dataset[Row], parts: Int = 0,
                slotKey: String = "prefix"): Dataset[Out] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val n = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    // sampling reads ONLY (group, ord): the projection lets Catalyst
    // prune the weight expression (often a full tokenization) out of
    // this pass, so the corpus pays it once, in the sharded layout
    val keys = rows.toDF("id", "grp", "ord", "w")
      .select($"grp", $"ord").as[SKey]
    val numParts = math.max(1, keys.rdd.getNumPartitions)
    val quota = math.max(MinQuota, SampleBudget / numParts)
    val firstLevel = keys.mapPartitions(it => RangeRouter.reservoirOf(it, quota))
    val sample =
      if (numParts.toLong * quota <= 2L * SampleBudget) firstLevel.collect()
      else {
        val groupQuota = math.max(MinQuota, SampleBudget / SampleGroups)
        firstLevel.coalesce(SampleGroups)
          .mapPartitions(it => RangeRouter.reservoirOf(it, groupQuota))
          .collect()
      }
    val bounds = boundariesOf(sample, n)
    val bBounds = spark.sparkContext.broadcast(bounds)
    val sharded = graft.operators.DedupOps.persistSlot(slotKey,
      rows.map { case (id, g, o, w) =>
        (shardOf(bBounds.value, (g, o)), id, g, o, w)
      }.toDF("shard", "id", "grp", "ord", "w")
        .repartition(n, $"shard")
        .sortWithinPartitions($"shard", $"grp", $"ord", $"id")
        .as[(Int, Long, String, Long, Long)])
    val totals = sharded.toDF("shard", "id", "grp", "ord", "w")
      .groupBy($"shard", $"grp")
      .agg(sum($"w").as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = new java.util.HashMap[(Int, String), Long]()
    totals.groupBy(_._2).foreach { case (g, rs) =>
      var acc = 0L
      rs.sortBy(_._1).foreach { case (sh, _, t) =>
        offsets.put((sh, g), acc)
        acc += t
      }
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    sharded.mapPartitions { it =>
      var curShard = -1
      var curGroup: String = null
      var run = 0L
      it.map { case (sh, id, g, o, w) =>
        if (sh != curShard || g != curGroup) {
          curShard = sh
          curGroup = g
          run = bOff.value.getOrDefault((sh, g), 0L)
        }
        val start = run
        run += w
        (id, g, o, w, start)
      }
    }
  }
}
