package graft

import org.apache.spark.sql.functions._

import graft.analysis.Profiles
import graft.model.Schemas._

/** Per-bin load imbalance: planted top-level spans yield hand-computed
  * integer busy times and max/mean ratios. */
class TimeImbalanceSpec extends SparkSpec {
  import spark.implicits._

  test("planted two-process trace gives the hand-computed profile") {
    // extent [0,100], 2 bins of width 50; proc 0 busy the whole time,
    // proc 1 busy only [0,25) → bin 0: max 50 / mean 37.5, bin 1: 50/25
    val ev = Seq(
      (0L, 0L, "Enter", "f", 0), (1L, 100L, "Leave", "f", 0),
      (2L, 0L, "Enter", "g", 1), (3L, 25L, "Leave", "g", 1))
      .toDF("id", "ts", "et", "nm", "proc")
      .select(col("id").as(EventId), col("ts").as(TimestampNs),
        col("et").as(EventType), col("nm").as(Name), col("proc").as(Process))
    val got = Profiles.timeImbalance(ev, numBins = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0L, 50L, 75L, 1.333333),
      (1L, 50L, 50L, 50L, 2.0)))
  }

  test("nested calls do not double-count busy time") {
    // child [10,40] inside parent [0,50]: busy = parent span only
    val ev = Seq(
      (0L, 0L, "Enter", "p", 0), (1L, 10L, "Enter", "c", 0),
      (2L, 40L, "Leave", "c", 0), (3L, 50L, "Leave", "p", 0))
      .toDF("id", "ts", "et", "nm", "proc")
      .select(col("id").as(EventId), col("ts").as(TimestampNs),
        col("et").as(EventType), col("nm").as(Name), col("proc").as(Process))
    val got = Profiles.timeImbalance(ev, numBins = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 50L, 50L, 1.0)))
  }
}
