package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_kmv_mins(hash, k)` — the k smallest DISTINCT long hash values
  * of a group, ascending: the KMV (k-minimum-values) distinct-count
  * sketch state (Bar-Yossef et al. 2002). The caller derives the
  * estimate from the k-th minimum: with hashes uniform on [0, M),
  * distinct ≈ (k−1)·M / h_k, and when the group holds fewer than k
  * distinct hashes the sketch IS the exact distinct set.
  *
  * Scale shape: this is the sketch that makes corpus-wide vocabulary /
  * cardinality statistics a SCAN, not a distinct: every partition's
  * partial buffer is ≤ k longs, the exchange moves k-long sketches
  * instead of the token stream, and merge is a bounded sorted-insert.
  * Unlike HLL-style sketches the state is a deterministic function of
  * the input SET — no engine-specific register layout — so a DuckDB
  * oracle replays it bit-for-bit with ORDER BY hash LIMIT k.
  *
  * Reference analog: the same fixed-capacity discipline as the decode
  * cache (ref crates/core/src/transformer/cache.rs:78-118).
  */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvMinsAgg.Buf]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_mins"

  override def createAggregationBuffer(): KmvMinsAgg.Buf =
    new KmvMinsAgg.Buf(0, new Array[Long](math.min(k, 16)))

  override def update(buf: KmvMinsAgg.Buf, input: InternalRow): KmvMinsAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: KmvMinsAgg.Buf, other: KmvMinsAgg.Buf): KmvMinsAgg.Buf = {
    var i = 0
    while (i < other.n) { buf.insert(other.vs(i), k); i += 1 }
    buf
  }

  override def eval(buf: KmvMinsAgg.Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.vs, buf.n))

  override def serialize(buf: KmvMinsAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvMinsAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val vs = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { vs(i) = bb.getLong(); i += 1 }
    new KmvMinsAgg.Buf(n, vs)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinsAgg =
    copy(child = newChild)
}

object KmvMinsAgg {

  /** Sorted-ascending distinct minima, at most k of them. Insert is a
    * binary search + bounded memmove — k is small by construction.
    */
  final class Buf(var n: Int, var vs: Array[Long]) {
    def insert(v: Long, k: Int): Unit = {
      if (n == k && v >= vs(n - 1)) return
      var idx = java.util.Arrays.binarySearch(vs, 0, n, v)
      if (idx >= 0) return // already present
      idx = -(idx + 1)
      if (n < k) {
        if (n == vs.length)
          vs = java.util.Arrays.copyOf(vs, math.min(k, vs.length * 2))
        System.arraycopy(vs, idx, vs, idx + 1, n - idx)
        vs(idx) = v
        n += 1
      } else {
        // full: drop the current max, shift, insert
        System.arraycopy(vs, idx, vs, idx + 1, n - idx - 1)
        vs(idx) = v
      }
    }
  }

  /** DataFrame aggregation column: ascending array of the group's k
    * smallest distinct hash values.
    */
  def column(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinsAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
