package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Windowed TV drift against a reference histogram, driven through
  * MemoryStream — one stateful aggregation, exact-integer numerator. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-window TV against the reference, clamped strays included") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDF().toDF("t_ms", "v")
      .withColumn("event_time", timestamp_millis(col("t_ms")))

    // reference: uniform 2 bins of 5 each (n_ref = 10); edges [0, 10)
    val q = StreamingOps.windowedDrift(events, Seq(5L, 5L),
        "10 seconds", "0 seconds", lo = 0L, width = 10L)
      .writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    try {
      stream.addData(
        // window [0,10s): values 1,2,8 → bins (0,0,1): c=(2,1), n=3
        (1000L, 1L), (2000L, 2L), (3000L, 8L),
        // window [10,20s): 99 clamps to bin 1, -7 clamps to bin 0
        (11000L, 99L), (12000L, -7L))
      q.processAllAvailable()
      val out = spark.table("drift").collect()
        .map(r => r.getTimestamp(0).getTime -> (r.getLong(1), r.getLong(2)))
        .toMap
      // w0: |2·10 − 5·3| + |1·10 − 5·3| = 5 + 5 = 10
      assert(out(0L) === ((3L, 10L)))
      // w1: c=(1,1), n=2 → |10−10| + |10−10| = 0 (balanced halves)
      assert(out(10000L) === ((2L, 0L)))
    } finally q.stop()
  }

  test("matching distribution drifts to zero; skew raises the numerator") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDF().toDF("t_ms", "v")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingOps.windowedDrift(events, Seq(3L, 1L),
        "10 seconds", "0 seconds", lo = 0L, width = 4L)
      .writeStream.format("memory").queryName("drift2")
      .outputMode("update").start()
    try {
      // window 0: 3 low + 1 high = exactly the reference shape
      stream.addData((1000L, 0L), (2000L, 1L), (3000L, 0L), (4000L, 3L))
      // window 1: all high — maximal skew vs reference
      stream.addData((11000L, 3L), (12000L, 3L))
      q.processAllAvailable()
      val out = spark.table("drift2").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(2)).toMap
      assert(out(0L) === 0L)
      // c=(0,2), n=2, ref=(3,1), n_ref=4: |0·4−3·2| + |2·4−1·2| = 6+6
      assert(out(10000L) === 12L)
    } finally q.stop()
  }

  test("keyedWindowedDrift tracks each key against the shared reference") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val events = stream.toDF().toDF("src", "t_ms", "v")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingOps.keyedWindowedDrift(events, "src", Seq(1L, 1L),
        "10 seconds", "0 seconds", lo = 0L, width = 4L)
      .writeStream.format("memory").queryName("kdrift")
      .outputMode("update").start()
    try {
      // same window, two keys: a matches the balanced reference, b is
      // all-high — the keyed state must keep them apart
      stream.addData(
        ("a", 1000L, 0L), ("a", 2000L, 3L),
        ("b", 1000L, 3L), ("b", 2000L, 3L))
      q.processAllAvailable()
      val out = spark.table("kdrift").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime) ->
          (r.getLong(2), r.getLong(3))).toMap
      // a: c=(1,1), n=2, ref=(1,1), n_ref=2 → tv 0
      assert(out(("a", 0L)) === ((2L, 0L)))
      // b: c=(0,2) → |0·2−1·2| + |2·2−1·2| = 2 + 2
      assert(out(("b", 0L)) === ((2L, 4L)))
    } finally q.stop()
  }

  test("windowedActive counts distinct users per window (chained stateful ops)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDF().toDF("user_id", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingOps.windowedActive(events, window = "10 seconds")
      .writeStream.format("memory").queryName("wactive")
      .outputMode("append").start()
    try {
      // window [0,10s): u1 three times + u2 once → 2 distinct;
      // [10,20s): u1 once → 1
      stream.addData((1L, 1000L), (1L, 2000L), (2L, 3000L), (1L, 1500L),
        (1L, 11000L))
      q.processAllAvailable()
      // advance the watermark past both windows so append emits them
      stream.addData((9L, 31000L))
      q.processAllAvailable()
      val out = spark.table("wactive").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      assert(out(0L) === 2L)
      assert(out(10000L) === 1L)
    } finally q.stop()
  }
}
