package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_hll_regs(hash, m)` — HyperLogLog register array (Flajolet et
  * al. 2007) over a group of 60-bit [[Hashing.md5i]] values: register
  * j = max over the group of rho(h div m) among hashes with h mod m = j,
  * where rho(w) = trailing zeros of w + 1, and rho(0) = [[HllRegsAgg
  * .RhoMax]]. Every piece is integer arithmetic on the shared md5i hash,
  * so a DuckDB oracle replays the registers bit-for-bit with a
  * max()-per-bucket GROUP BY and a CASE chain for rho — no engine-
  * specific register layout (same cross-engine discipline as
  * [[KmvMinsAgg]]).
  *
  * Scale shape: the per-partition partial state is m bytes regardless of
  * group size; the exchange moves m-byte sketches instead of the token
  * stream, and merge is an element-wise max. KMV gives the exact set
  * below k; HLL holds its ~1.04/sqrt(m) relative error at ANY
  * cardinality with constant state — the right sketch when one group is
  * the whole corpus.
  *
  * Trailing-zero rank (rather than the paper's leading-zero rank) is an
  * equivalent uniformity spec and keeps the oracle's CASE chain a plain
  * `w mod 2^r` comparison.
  */
case class HllRegsAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_regs"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) HllRegsAgg.RhoMax
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)
}

object HllRegsAgg {

  /** rho for w == 0. md5i hashes are 60-bit, so with m = 256 buckets the
    * payload w = h div 256 is below 2^52 and a nonzero w has rho ≤ 52;
    * 53 marks the all-zero payload. Spec constant shared with the oracle.
    */
  val RhoMax = 53

  /** DataFrame aggregation column: the group's m HLL registers. */
  def column(c: Column, m: Int): Column =
    ColumnBridge.column(
      HllRegsAgg(ColumnBridge.expression(c), m).toAggregateExpression())
}
