package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concurrency profile over intervals — "how many spans were open at
  * once, for how long": the classic timeline-viewer occupancy histogram
  * (GPU stream occupancy, overlapping request spans, parallel region
  * efficiency), computed as a sweep.
  *
  * Formulation: every interval contributes +1 at its start and −1 at
  * its end; net deltas per (key, timestamp) prefix-summed in time order
  * give the open-span count for the segment up to the next breakpoint,
  * and the profile is the duration-weighted histogram of those levels.
  * This is O(n log n) with NO self-join — the naive "count overlaps per
  * interval" range self-join is quadratic per key and unusable at
  * scale.
  *
  * Plan shape: one map-side-combined aggregation on (key, ts) — shuffle
  * volume is the distinct breakpoint count, not the interval count —
  * then one keyed window (single exchange on the key, O(1) state per
  * row) and a final small aggregation. Intra-tick event order is
  * irrelevant by construction (deltas at equal timestamps are summed
  * before the scan), so the result is deterministic on any engine.
  */
object Concurrency {

  /** @return (key, level, total, n_segments): per key, the total time
    *         spent with exactly `level` spans open and the number of
    *         constant-level segments; the half-open segment after the
    *         last breakpoint (level 0 forever) is not emitted. */
  def concurrencyProfile(intervals: DataFrame, keyCol: String = "process",
                         startCol: String = "start", endCol: String = "end")
      : DataFrame = {
    val deltas = intervals.select(col(keyCol), col(startCol).as("t"),
        lit(1L).as("delta"))
      .unionByName(intervals.select(col(keyCol), col(endCol).as("t"),
        lit(-1L).as("delta")))
    val net = deltas.groupBy(col(keyCol), col("t"))
      .agg(sum(col("delta")).as("net"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("t"))
    net
      .withColumn("level", sum(col("net")).over(w))
      .withColumn("nxt", lead(col("t"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col(keyCol), col("level"))
      .agg(sum(col("nxt") - col("t")).as("total"),
        count(lit(1)).as("n_segments"))
  }

  /** Two-class OVERLAP time per key — the pipelining-efficiency question
    * ("how much did compute overlap the copies", kernel vs memcpy,
    * request vs downstream call): total time ≥1 `classA` span AND ≥1
    * `classB` span were open simultaneously. Same sweep as
    * [[concurrencyProfile]] with one running counter per class: the
    * per-(key, tick) net deltas are summed per class BEFORE the scan, so
    * half-open [start, end) semantics and intra-tick order fall out for
    * free, and the plan is the identical one-aggregation + one-keyed-
    * window shape — never the quadratic interval-intersection join. */
  def classOverlap(intervals: DataFrame, classA: String, classB: String,
                   keyCol: String = "process", classCol: String = "cls",
                   startCol: String = "start", endCol: String = "end")
      : DataFrame = {
    val relevant = intervals.filter(col(classCol).isin(classA, classB))
    // ONE exchange (r11): the former groupBy(key, t) netting pass
    // shuffled the full delta stream once for the aggregation and again
    // for the key window — and (key, t) keys are nearly unique, so the
    // map-side combine reduced nothing. Instead the running sums use a
    // RANGE frame (inclusive of all peers at the same t, which IS the
    // post-t net state), and the per-t collapse falls out of the
    // `nxt > t` filter: among rows sharing a t only the last in window
    // order has lead(t) ≠ t, its frame-inclusive sums equal the netted
    // state, and the others would contribute zero-length segments the
    // old formulation never saw. The class tag is also resolved to
    // integer deltas BEFORE the exchange — no strings in the shuffle.
    val da = when(col(classCol) === classA, lit(1L)).otherwise(lit(0L))
    val db = when(col(classCol) === classB, lit(1L)).otherwise(lit(0L))
    val deltas = relevant.select(col(keyCol),
        col(startCol).as("t"), da.as("da"), db.as("db"))
      .unionByName(relevant.select(col(keyCol),
        col(endCol).as("t"), (-da).as("da"), (-db).as("db")))
    val wr = Window.partitionBy(col(keyCol)).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("t"))
    deltas
      .withColumn("open_a", sum(col("da")).over(wr))
      .withColumn("open_b", sum(col("db")).over(wr))
      .withColumn("nxt", lead(col("t"), 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") > col("t") &&
        col("open_a") > 0 && col("open_b") > 0)
      .groupBy(col(keyCol))
      .agg(sum(col("nxt") - col("t")).as("overlap_total"),
        count(lit(1)).as("n_segments"))
  }
}
