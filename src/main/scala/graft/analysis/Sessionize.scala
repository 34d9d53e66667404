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
}
