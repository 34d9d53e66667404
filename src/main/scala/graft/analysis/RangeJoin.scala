package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-point range join — "which interval(s) contain each point"
  * (attribution windows, trace-span containment, time-range lookups).
  *
  * Spark plans a raw `t BETWEEN start AND end` join as
  * BroadcastNestedLoop (or worse, a cartesian product when neither side
  * fits in memory) — quadratic per key. The scalable formulation buckets
  * time into fixed-width bins: each point falls in exactly one bin, each
  * interval is exploded onto the bins it overlaps, and the join becomes
  * a hash equi-join on (key, bin) followed by the exact range predicate.
  * Work is Σ per-(key,bin) |points|·|intervals| — quadratic only inside
  * one bin of one key, linear across the corpus. Interval explosion is
  * bounded: len/binWidth + 1 rows per interval, so pick `binWidth` near
  * the typical interval length (≈2 bins per interval).
  *
  * This is the same binning idea as the time_profile overlap explode
  * ([[TimeProfile]]) applied to general joins.
  */
object RangeJoin {

  /** Inner-join points to the intervals containing them (inclusive on
    * both ends), within `keyCols`. Point and interval column sets must
    * not collide apart from `keyCols` (rename before calling). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], tCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // exact integer floor division (works for negative ts too): double
    // division is actually safe here by IEEE monotonicity, but integer
    // arithmetic removes any doubt at extreme magnitudes and is cheaper
    def binOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")
    val p = points.withColumn("__bin", binOf(col(tCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }
}
