package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps

/** Streaming as-of enrichment: O(1) per-key state carried across
  * micro-batches, batch-operator tie/inclusivity semantics within a
  * batch. */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("left rows see the latest right at-or-before, state survives batches") {
    implicit val sqlCtx = spark.sqlContext
    val leftS = MemoryStream[(Long, Long, Long, Double)]
    val rightS = MemoryStream[(Long, Long, Long, Double)]
    def df(s: MemoryStream[(Long, Long, Long, Double)]) =
      s.toDF().toDF("user_id", "t", "event_id", "value")

    val q = StreamingOps.asOfLatest(df(leftS), df(rightS))
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      // batch 1: right at t=50 (id 10), left at t=100 and t=40
      rightS.addData((7L, 50L, 10L, 1.5))
      leftS.addData((7L, 100L, 1L, 0.0), (7L, 40L, 2L, 0.0))
      q.processAllAvailable()
      val b1 = spark.table("asof").collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(b1(1L) == 10L) // t=100 sees right@50
      assert(b1(2L) == -1L) // t=40 precedes every right row
      // batch 2: newer right (t=200, id 11), then a left after it;
      // the right row from batch 1 must have persisted for key isolation
      rightS.addData((7L, 200L, 11L, 2.5), (8L, 60L, 12L, 9.9))
      leftS.addData((7L, 250L, 3L, 0.0), (8L, 70L, 4L, 0.0))
      q.processAllAvailable()
      val b2 = spark.table("asof").collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(b2(3L) == 11L) // key 7: newest right
      assert(b2(4L) == 12L) // key 8: its own right, not key 7's
    } finally q.stop()
  }

  test("equal-ts right is visible (inclusive); right ties pick highest id") {
    implicit val sqlCtx = spark.sqlContext
    val leftS = MemoryStream[(Long, Long, Long, Double)]
    val rightS = MemoryStream[(Long, Long, Long, Double)]
    def df(s: MemoryStream[(Long, Long, Long, Double)]) =
      s.toDF().toDF("user_id", "t", "event_id", "value")

    val q = StreamingOps.asOfLatest(df(leftS), df(rightS))
      .writeStream.format("memory").queryName("asof2").outputMode("append").start()
    try {
      rightS.addData((7L, 100L, 10L, 1.0), (7L, 100L, 12L, 3.0), (7L, 100L, 11L, 2.0))
      leftS.addData((7L, 100L, 1L, 0.0))
      q.processAllAvailable()
      val r = spark.table("asof2").collect().head
      assert(r.getLong(3) == 12L && r.getDouble(5) == 3.0)
    } finally q.stop()
  }
}
