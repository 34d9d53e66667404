package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.analysis.Sessionize
import graft.streaming.StreamingOps

/** Streaming cohort tagging: cross-batch cohort memory, per-day dedup,
  * and the downstream aggregation reproduces the batch retention
  * matrix when no late data arrives. */
class StreamingCohortSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  test("cohorts persist across batches and aggregate to the batch matrix") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val ev = stream.toDF().toDF("user_id", "t_us")
    val q = StreamingOps.cohortEvents(ev)
      .writeStream.format("memory").queryName("coh").outputMode("append").start()
    try {
      // batch 1: u1,u2 start day0 (u1 twice in-day — dedup)
      stream.addData((1L, 0L * day + 5), (1L, 0L * day + 9), (2L, 0L * day + 7))
      q.processAllAvailable()
      // batch 2: u1 returns day1 (twice, across the batch boundary too),
      // u3 starts day1
      stream.addData((1L, 1L * day + 1), (1L, 0L * day + 11), (3L, 1L * day + 2))
      q.processAllAvailable()
      val streamed = spark.table("coh")
        .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("n_active"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sessionize.cohortRetention(
          Seq((1L, 0L * day + 5), (1L, 0L * day + 9), (2L, 0L * day + 7),
            (1L, 1L * day + 1), (1L, 0L * day + 11), (3L, 1L * day + 2))
            .toDF("user_id", "t_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch && streamed((0L, 0L)) == 2L)
    } finally q.stop()
  }

  test("a late pre-cohort event surfaces as a negative offset, not a rewrite") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val ev = stream.toDF().toDF("user_id", "t_us")
    val q = StreamingOps.cohortEvents(ev)
      .writeStream.format("memory").queryName("cohlate").outputMode("append").start()
    try {
      stream.addData((1L, 5L * day + 1))
      q.processAllAvailable()
      stream.addData((1L, 3L * day + 1)) // late: before the recorded cohort
      q.processAllAvailable()
      val rows = spark.table("cohlate").orderBy("day_offset")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((5L, -2L), (5L, 0L)))
    } finally q.stop()
  }
}
