package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Cross-run clock alignment — the precondition for every two-trace
  * comparison (multirun, CCT diff, duration drift): traces recorded on
  * different hosts/runs sit on unrelated clocks, so timestamps cannot be
  * compared until one run is shifted onto the other's timebase. The
  * poor-man's sync point used in practice when no barrier timestamp is
  * recorded: per process, the first Enter marks "the same moment" in
  * both runs, and the per-process offset is the difference of those
  * first Enters (per PROCESS, not global — node clocks skew
  * independently).
  *
  * Scale shape: the offset table is one partial-aggregated min per
  * process per run — process-count-sized — broadcast back onto the
  * full trace; the event stream itself is never shuffled. */
object TraceAlign {

  /** Per-process offset_ns such that `b.ts + offset_ns` sits on `a`'s
    * clock: first-Enter(a) − first-Enter(b). Processes present in only
    * one run are absent (nothing to align against). */
  def offsets(a: DataFrame, b: DataFrame): DataFrame = {
    def firstEnter(t: DataFrame, as: String) =
      t.filter(col(EventType) === Enter)
        .groupBy(col(Process)).agg(min(col(TimestampNs)).as(as))
    firstEnter(a, "t_a").join(firstEnter(b, "t_b"), Seq(Process))
      .select(col(Process), (col("t_a") - col("t_b")).as("offset_ns"))
  }

  /** `b` shifted onto `a`'s clock via [[offsets]]. Events of processes
    * unseen in `a` pass through unshifted (offset 0) — flagged by
    * `aligned = false` so downstream comparisons can exclude them. */
  def align(a: DataFrame, b: DataFrame): DataFrame = {
    val off = offsets(a, b)
    b.join(broadcast(off), Seq(Process), "left")
      .withColumn("aligned", col("offset_ns").isNotNull)
      .withColumn(TimestampNs,
        col(TimestampNs) + coalesce(col("offset_ns"), lit(0L)))
      .drop("offset_ns")
  }
}
