package graft

import graft.analysis.Intervals

/** Interval-union islands: overlap merges, touching merges (half-open
  * spans), strict gaps split, and ties on (start, end) are order-safe. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping and touching spans merge; gaps split") {
    // key 0: [0,10) + [5,12) overlap, [12,20) touches → one island [0,20)
    //        [25,30) after a gap → second island
    // key 1: [1,2) alone
    val iv = Seq((0, 0L, 10L), (0, 5L, 12L), (0, 12L, 20L), (0, 25L, 30L),
      (1, 1L, 2L)).toDF("key", "start", "end")
    val got = Intervals.mergeIntervals(iv).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (0, 1L, 0L, 20L, 3L),
      (0, 2L, 25L, 30L, 1L),
      (1, 1L, 1L, 2L, 1L)))
  }

  test("a span nested inside an earlier one does not re-open the island") {
    // [0,100) then [10,20): running max end stays 100, island count 1
    val iv = Seq((0, 0L, 100L), (0, 10L, 20L), (0, 50L, 60L))
      .toDF("key", "start", "end")
    val got = Intervals.coverage(iv).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, 1L, 100L, 3L)))
  }

  test("duplicate (start,end) rows land in one island deterministically") {
    val iv = Seq((0, 5L, 9L), (0, 5L, 9L), (0, 5L, 9L))
      .toDF("key", "start", "end")
    val got = Intervals.mergeIntervals(iv).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 5L, 9L, 3L)))
  }

  test("coverage sums only covered time, not span lengths") {
    // [0,10) + [5,15) cover 15, not 20
    val iv = Seq((7, 0L, 10L), (7, 5L, 15L)).toDF("key", "start", "end")
    val got = Intervals.coverage(iv).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 15L, 2L)))
  }
}
