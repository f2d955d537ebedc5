package graft.verify

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (the §2.10 UDAF surface): max |diff| AND the key
  * where it occurs — the reference's verify reduce reports the argmax
  * coordinates alongside the max
  * (/root/reference/crates/core/tests/baseline.rs:918-946), and a plain
  * `max(abs(a-b))` loses that. Diff quantized at 1e-6 like the rest of
  * the parity harness; ties resolve to the smallest key (deterministic
  * across partitionings — merge order cannot leak into the answer).
  */
object MaxAbsDiff {

  /** (quantized max diff, smallest key attaining it); (-1, MaxValue) ≡
    * empty.
    */
  final case class Acc(maxQ6: Long, atKey: Long)

  val agg: Aggregator[(Double, Long), Acc, Acc] =
    new Aggregator[(Double, Long), Acc, Acc] {
      override def zero: Acc = Acc(-1L, Long.MaxValue)
      override def reduce(b: Acc, in: (Double, Long)): Acc = {
        val q6 = math.floor(math.abs(in._1) * 1000000).toLong
        if (q6 > b.maxQ6) Acc(q6, in._2)
        else if (q6 == b.maxQ6 && in._2 < b.atKey) Acc(q6, in._2)
        else b
      }
      override def merge(x: Acc, y: Acc): Acc =
        if (x.maxQ6 > y.maxQ6) x
        else if (y.maxQ6 > x.maxQ6) y
        else Acc(x.maxQ6, math.min(x.atKey, y.atKey))
      override def finish(r: Acc): Acc =
        if (r.maxQ6 < 0) Acc(0L, -1L) else r
      override def bufferEncoder: Encoder[Acc] = Encoders.product[Acc]
      override def outputEncoder: Encoder[Acc] = Encoders.product[Acc]
    }
}
