package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.analysis.CommOps
import graft.streaming.StreamingComm

/** Streaming message matching: FIFO twin reproduces the batch pairing,
  * pending state carries across batches, and the built-in interval-join
  * variant emits exactly the in-window candidate pairs. */
class StreamingCommSpec extends SparkSpec {
  import spark.implicits._

  private def ev(s: MemoryStream[(Long, Long, Long, String, Long)]) =
    s.toDF().toDF("process", "attr_receiver", "timestamp_ns", "name", "event_id")

  test("FIFO matcher pairs k-th send with k-th recv, state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    val q = StreamingComm.matchMessages(ev(in))
      .writeStream.format("memory").queryName("fifo").outputMode("append").start()
    try {
      // batch 1: sends id1@100, id2@200 on 0->1; one recv id3@150
      in.addData((0L, 1L, 100L, "MpiSend", 1L), (0L, 1L, 200L, "MpiSend", 2L),
        (1L, 0L, 150L, "MpiRecv", 3L))
      q.processAllAvailable()
      val b1 = spark.table("fifo").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7)))
      assert(b1.toSet == Set((1L, 1L, 3L, 50L)))
      // batch 2: the pending send id2 completes with recv id4, rank 2;
      // an unrelated channel 2->3 starts its own ranking at 1
      in.addData((1L, 0L, 500L, "MpiRecv", 4L), (2L, 3L, 10L, "MpiSend", 5L),
        (3L, 2L, 20L, "MpiRecv", 6L))
      q.processAllAvailable()
      val b2 = spark.table("fifo").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(b2.toSet == Set((0L, 1L, 1L, 1L, 3L), (0L, 1L, 2L, 2L, 4L),
        (2L, 3L, 1L, 5L, 6L)))
    } finally q.stop()
  }

  test("single-batch FIFO output equals the batch matcher row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (0L, 1L, 100L, "MpiSend", 1L), (0L, 1L, 300L, "MpiSend", 2L),
      (1L, 0L, 150L, "MpiRecv", 10L), (1L, 0L, 350L, "MpiRecv", 11L),
      (2L, 0L, 50L, "MpiIsend", 20L), (0L, 2L, 90L, "MpiIrecv", 21L),
      (0L, 1L, 400L, "MpiSend", 3L)) // unmatched pending send
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    val q = StreamingComm.matchMessages(ev(in))
      .writeStream.format("memory").queryName("fifo_eq").outputMode("append").start()
    val got = try {
      in.addData(rows: _*)
      q.processAllAvailable()
      spark.table("fifo_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(7))).toSet
    } finally q.stop()
    val batch = CommOps.matchMessages(rows.toDF(
        "process", "attr_receiver", "timestamp_ns", "name", "event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3), r.getLong(4), r.getLong(7))).toSet
    assert(got == batch && batch.size == 3)
  }

  test("interval join emits in-window candidates only, no user state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    // 10 s window = 1e10 ns: recv id3 inside, recv id4 (12 s later) outside,
    // recv id6 on another channel never pairs with the 0->1 send
    val q = StreamingComm.matchMessagesWindow(ev(in), maxLatency = "10 seconds")
      .writeStream.format("memory").queryName("iv").outputMode("append").start()
    try {
      in.addData((0L, 1L, 1000000L, "MpiSend", 1L),
        (1L, 0L, 2000000L, "MpiRecv", 3L),
        (1L, 0L, 13000000000L, "MpiRecv", 4L),
        (3L, 2L, 2000000L, "MpiRecv", 6L))
      q.processAllAvailable()
      val got = spark.table("iv").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(6)))
      assert(got.toSet == Set((1L, 3L, 1000000L)))
    } finally q.stop()
  }

  test("structurePairs finalizes per-window channel counts on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, Long, String)]
    // (process, attr_receiver, attr_msg_length, timestamp_ns, name)
    val df = in.toDF().toDF("process", "attr_receiver", "attr_msg_length",
      "timestamp_ns", "name")
    // 1 ms tumbling windows, zero watermark delay
    val q = StreamingComm.structurePairs(df, 1000000L, "0 seconds")
      .writeStream.format("memory").queryName("spairs")
      .outputMode("append").start()
    try {
      // window [0,1ms): 0->1 twice (30 bytes), 1->0 once; a recv is ignored
      in.addData((0L, 1L, 10L, 100000L, "MpiSend"),
        (0L, 1L, 20L, 200000L, "MpiSend"),
        (1L, 0L, 30L, 500000L, "MpiSend"),
        (0L, 1L, 99L, 150000L, "MpiRecv"))
      q.processAllAvailable()
      // sentinel in a later window advances the watermark past window 0;
      // its own (still-open) window must NOT emit
      in.addData((5L, 6L, 1L, 5000000L, "MpiSend"))
      q.processAllAvailable()
      val got = spark.table("spairs").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == Set((0L, 0L, 1L, 2L, 30L), (0L, 1L, 0L, 1L, 30L)))
    } finally q.stop()
  }
}
