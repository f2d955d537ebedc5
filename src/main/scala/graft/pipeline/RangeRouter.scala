package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Exact range placement without RangePartitioner's double execution.
  *
  * `repartitionByRange` samples its child to learn boundaries — which
  * RE-EXECUTES the whole upstream chain (for this pipeline: derivation +
  * the extraction kernel) once for sampling and once for the real
  * shuffle. This router splits the two concerns:
  *
  *   1. boundaries come from a cheap key-only reservoir pass (kernel not
  *      run) collected to the driver and broadcast;
  *   2. each row computes its range bucket by binary search and is placed
  *      EXACTLY into that partition through one ordinary hash shuffle,
  *      using a precomputed token v_t with pmod(murmur3(v_t, 42), n) == t
  *      — Spark's HashPartitioning becomes an identity router.
  *
  * The output keeps true range clustering (partition i holds a
  * contiguous (salt, doc_id) key interval, intervals ordered by i) at
  * the cost of one narrow pass — instead of a full double execution.
  * This mirrors how table formats sketch write distributions at scale.
  */
object RangeRouter {

  type Key = (Long, String) // (salt, doc_id) — ordering is salt, then id

  /** Stable kernel-side salt (independent of Spark expression hashes). */
  def key(docId: String, saltBuckets: Int): Key = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < docId.length) { h ^= docId.charAt(i); h *= 0x100000001b3L; i += 1 }
    val m = (h % saltBuckets).toInt
    ((if (m < 0) m + saltBuckets else m).toLong, docId)
  }

  private val keyOrd: Ordering[Key] = Ordering.Tuple2(Ordering.Long, Ordering.String)

  /** Deterministic per-partition reservoir sample of up to `k` keys. */
  def reservoir(it: Iterator[Key], k: Int = 128): Iterator[Key] =
    reservoirOf(it, k)

  /** [[reservoir]] over any key type (seeded by the task's partition). */
  def reservoirOf[T](it: Iterator[T], k: Int = 128)
                    (implicit ct: scala.reflect.ClassTag[T]): Iterator[T] = {
    val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
    val rng = new java.util.Random(pid * 2654435761L + 42L)
    val buf = new Array[T](k)
    var seen = 0
    while (it.hasNext) {
      val key = it.next()
      if (seen < k) buf(seen) = key
      else {
        val j = rng.nextInt(seen + 1)
        if (j < k) buf(j) = key
      }
      seen += 1
    }
    buf.iterator.take(math.min(seen, k))
  }

  /** n-1 ascending boundary keys (quantiles of the sorted sample). */
  def boundaries(sample: Array[Key], n: Int): Array[Key] = {
    if (sample.isEmpty || n <= 1) return Array.empty
    val sorted = sample.sorted(keyOrd)
    (1 until n).map { i =>
      // Long quantile index: i * length overflows Int once the
      // sample × partition-count product passes 2^31
      sorted(math.min(sorted.length - 1L, i.toLong * sorted.length / n).toInt)
    }.distinct.toArray
  }

  /** Range bucket: number of boundaries <= key (binary search). */
  def bucket(bounds: Array[Key], k: Key): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (keyOrd.lteq(bounds(mid), k)) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** tokens(t) hashes to partition t under Spark's HashPartitioning
    * (murmur3 seed 42): pmod(hash(tokens(t)), n) == t.
    */
  def hashTokens(n: Int): Array[Int] = {
    val tokens = new Array[Int](n)
    val found = new Array[Boolean](n)
    var v = 0
    var left = n
    while (left > 0) {
      val h = Murmur3_x86_32.hashInt(v, 42)
      val t = ((h % n) + n) % n
      if (!found(t)) { found(t) = true; tokens(t) = v; left -= 1 }
      v += 1
    }
    tokens
  }
}
