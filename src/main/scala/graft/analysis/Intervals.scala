package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union operators: merge overlapping/touching spans per key
  * into maximal "islands" (the classic coverage/union problem: machine
  * busy-time from job spans, user active-time from sessions, sensor
  * uptime from heartbeats).
  *
  * Formulation: per key in (start, end) order, a span starts a new
  * island iff its start lies strictly after the running maximum of all
  * previous ends; the island id is the running count of such starts.
  * Touching spans (start == previous end) therefore MERGE — half-open
  * [s, e) semantics. This is one keyed window pass (single exchange on
  * the key, O(1) state per row), never the quadratic overlap self-join.
  *
  * Tie safety: rows tying on (start, end) are interchangeable for the
  * running MAX(end), so the island assignment is deterministic on any
  * engine without a unique tie-break column.
  */
object Intervals {

  /** @return (key, island, start, end, n_spans): one row per maximal
    *         merged interval; `island` is the per-key 1-based island
    *         ordinal in time order. */
  def mergeIntervals(df: DataFrame, keyCol: String = "key",
                     startCol: String = "start", endCol: String = "end")
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      // explicit ROWS frame: the default with an ORDER BY is RANGE, which
      // sums ALL peers of a tied row; ROWS matches the oracle's scan. The
      // two agree here anyway (among (start,end) ties only the first row
      // in any order can carry flag 1 — its start <= the shared end), but
      // only ROWS makes that an invariant rather than an argument.
      .withColumn("island", sum(col("__new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_spans"))
  }

  /** Per-key coverage summary over the merged islands: number of
    * maximal intervals, total covered time, and the largest merge. */
  def coverage(df: DataFrame, keyCol: String = "key",
               startCol: String = "start", endCol: String = "end")
      : DataFrame =
    mergeIntervals(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_merged"),
        sum(col("end") - col("start")).as("covered"),
        max(col("n_spans")).as("max_merged"))
}
