package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left event to the LATEST prior right event of
  * the same key — the time-series join every attribution / feature-
  * lookup pipeline needs (same family as the stream-stream interval
  * join, but "most recent one", not "all within range").
  *
  * Spark-first shape (operator-composition tier (a) of SURVEY §2.10):
  * instead of an inequality join — O(|L|·|R|) pairs per key before the
  * per-key argmax, the classic range-join blowup — the two sides are
  * UNION-TAGGED into one stream and the match is a running
  * `last(_, ignoreNulls)` over a (key, time) window. ONE hash exchange
  * on the key, one sort, zero joins; at 100 TB the wire carries each
  * row exactly once. The window frame ends at 1 PRECEDING in the
  * (ts, event_id) total order, so "prior" is strict and deterministic
  * under timestamp ties.
  *
  * Reference analog: the decoder's "most recent KV state wins" append
  * discipline (ref crates/core/src/transformer/cache.rs:204-258) — an
  * as-of lookup against an append-only timeline.
  */
object AsofOps {

  /** For every `leftType` event: the latest strictly-prior `rightType`
    * event by the same user, as (user_id, left_id, right_id, gap_us),
    * right_id/gap_us = -1 when no prior right event exists.
    */
  def asofLatestPrior(events: DataFrame, leftType: String,
                      rightType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp_ltz").as("ts"), col("event_type"),
        when(col("event_type") === rightType, col("event_id")).as("r_id"),
        when(col("event_type") === rightType,
          unix_micros(col("ts").cast("timestamp_ltz"))).as("r_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("prior_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("prior_us", last(col("r_us"), ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("left_id"),
        coalesce(col("prior_id"), lit(-1L)).as("right_id"),
        coalesce(unix_micros(col("ts")) - col("prior_us"), lit(-1L)).as("gap_us"))
  }
}
