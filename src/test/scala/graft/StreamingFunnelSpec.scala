package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps

/** Streaming funnel: order-strict advancement, state across batches,
  * key isolation. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("advances in order across batches and emits one row per step") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, String)]
    val df = stream.toDF().toDF("user_id", "t", "event_id", "event_type")
    val q = StreamingOps.funnel(df, Seq("view", "click", "buy"))
      .writeStream.format("memory").queryName("sfun").outputMode("append").start()
    try {
      // batch 1: view then an out-of-order click BEFORE it (same batch:
      // sorted -> click at t=5 precedes the view, must not count)
      stream.addData((7L, 10L, 1L, "view"), (7L, 5L, 2L, "click"))
      q.processAllAvailable()
      val b1 = spark.table("sfun").collect().map(r => (r.getInt(1), r.getLong(2)))
      assert(b1.toSeq == Seq((1, 10L)))
      // batch 2: click after the view, then buy; key 8 starts its own funnel
      stream.addData((7L, 20L, 3L, "click"), (7L, 30L, 4L, "buy"),
        (8L, 1L, 5L, "click"))
      q.processAllAvailable()
      val rows = spark.table("sfun").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rows == Set((7L, 1, 10L), (7L, 2, 20L), (7L, 3, 30L)))
      // key 8's click without a view emitted nothing
    } finally q.stop()
  }
}
