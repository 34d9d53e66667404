package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the batch twin of the
  * Structured Streaming session-window (see graft.streaming). One shuffle
  * on the key; session ids via lag + running sum windows (both execute in
  * the same window stage over the same partitioning). */
object Sessionize {

  /** Assign session ids per key: a new session starts when the gap to the
    * previous event exceeds `gapMicros`. `tsCol` must be in microseconds
    * (or any unit consistent with the gap). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 orderCol: String, gapMicros: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    val prev = lag(col(tsCol), 1).over(byTime)
    events
      .withColumn("__new_session",
        when(prev.isNull || col(tsCol) - prev > gapMicros, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Per-session aggregate: event count (long-form). */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    orderCol: String, gapMicros: Long): DataFrame =
    sessionize(events, keyCol, tsCol, orderCol, gapMicros)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Ordered conversion funnel: for each key, the earliest time each
    * step completes GIVEN the previous step completed before it —
    * t₁ = min ts of step 1, tᵢ = min ts of step i strictly after tᵢ₋₁
    * (the standard strictly-sequential funnel definition; re-orderings
    * don't count). Returns one row per key with the step times (null
    * where the funnel stalls) and the reached depth.
    *
    * One filtered aggregation per step, chained by an equi-join on the
    * key — n_steps shuffles of per-key aggregates (never the raw event
    * stream after step 1); the conditional min keeps each stage a
    * partial+final aggregation. */
  def funnel(events: DataFrame, steps: Seq[String], keyCol: String,
             tsCol: String, stepCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(stepCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    val full = steps.zipWithIndex.tail.foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        acc.join(events.filter(col(stepCol) === step)
            .select(col(keyCol), col(tsCol).as("__ts")), Seq(keyCol), "left")
          .groupBy((col(keyCol) +: (1 to i).map(j => col(s"t$j"))): _*)
          .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(cur))
    }
    val depth = (1 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.withColumn("depth", depth)
  }
}
