package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps

/** Streaming flat profile over a completed-call stream: windowed
  * per-function exc totals close as the watermark advances. */
class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  test("per-window per-function exc totals match hand computation") {
    implicit val sqlCtx = spark.sqlContext
    val calls = MemoryStream[(String, Long, Long)]
    val df = calls.toDF().toDF("name", "leave_ts", "time_exc")

    val q = StreamingOps.flatProfile(df, "10 seconds", "0 seconds")
      .writeStream.format("memory").queryName("sprof").outputMode("append").start()
    try {
      // leave_ts in ns; window = 10 s of event time
      calls.addData(("foo", 1_000_000_000L, 5L), ("foo", 2_000_000_000L, 7L),
        ("bar", 3_000_000_000L, 11L))
      q.processAllAvailable()
      // advance the watermark past the first window to close it
      calls.addData(("foo", 25_000_000_000L, 1L))
      q.processAllAvailable()
      val rows = spark.table("sprof").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSet == Set(("foo", 12L, 2L), ("bar", 11L, 1L)))
    } finally q.stop()
  }
}
