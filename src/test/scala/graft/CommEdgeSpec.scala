package graft

import org.apache.spark.sql.functions._
import graft.analysis.CommOps
import graft.model.Schemas._

/** Edge cases for the communication operators: degenerate ranges (numpy
  * semantics) and null-tolerant dense collection. */
class CommEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def sends(rows: (Long, Long, Int, Int)*) =
    rows.toDF("ts", "len", "proc", "recv")
      .select(col("ts").as(TimestampNs), lit("MpiSend").as(Name),
        col("proc").as(Process), col("recv").as(AttrReceiver),
        col("len").as(AttrMsgLength), lit("Instant").as(EventType))

  test("all-equal message sizes expand the range (numpy rule), no NaN bins") {
    val ev = sends((10L, 512L, 0, 1), (20L, 512L, 1, 0), (30L, 512L, 0, 1))
    val h = CommOps.messageHistogram(ev, bins = 4).collect()
    assert(h.length == 4)
    assert(h.map(_.getLong(3)).sum == 3) // every message lands in a bin
    val starts = h.map(_.getDouble(1))
    assert(starts.head == 511.5 && !starts.exists(_.isNaN)) // lo - 0.5
  }

  test("single-timestamp trace: comm_over_time expands, volumes intact") {
    val ev = sends((100L, 7L, 0, 1), (100L, 9L, 1, 0))
    val c = CommOps.commOverTime(ev, bins = 5).collect()
    assert(c.length == 5)
    assert(c.map(_.getLong(3)).sum == 16)
  }

  test("dense matrix skips null receivers and survives empty traces") {
    val empty = sends().limit(0)
    assert(CommOps.commMatrixDense(empty).isEmpty)
    val withNull = sends((10L, 100L, 0, 1))
      .union(Seq((20L, 50L, 1)).toDF("ts", "len", "proc")
        .select(col("ts").as(TimestampNs), lit("MpiSend").as(Name),
          col("proc").as(Process), lit(null).cast("int").as(AttrReceiver),
          col("len").as(AttrMsgLength), lit("Instant").as(EventType)))
    val m = CommOps.commMatrixDense(withNull)
    assert(m(0)(1) == 100L) // the null-receiver send is skipped, not an NPE
  }

  test("message matching pairs k-th send with k-th recv; excess stays unmatched") {
    // channel 0->1: sends at t=10,20,30; recvs at q=1 from 0 at t=15,25
    // channel 1->0: one send, no recv
    val ev = Seq(
      (0L, 10L, "MpiSend", 0, 1), (1L, 20L, "MpiIsend", 0, 1),
      (2L, 30L, "MpiSend", 0, 1), (3L, 15L, "MpiRecv", 1, 0),
      (4L, 25L, "MpiIrecv", 1, 0), (5L, 40L, "MpiSend", 1, 0)
    ).toDF("id", "ts", "nm", "proc", "peer")
      .select(col("id").as(EventId), col("ts").as(TimestampNs),
        col("nm").as(Name), col("proc").as(Process),
        col("peer").as(AttrReceiver), lit("Instant").as(EventType))
    val m = CommOps.matchMessages(ev).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(7)))).toMap
    // (send_event_id, recv_event_id, latency)
    assert(m((0, 1, 1)) == ((0L, 3L, 5L)))
    assert(m((0, 1, 2)) == ((1L, 4L, 5L)))
    assert(m.size == 2) // 3rd send on 0->1 and the lone 1->0 send unmatched
  }

  test("commStructure: ring, hotspot, self and wraparound counted per bin") {
    // 4 ranks. Bin 0 (ts 0..49): a ring 0→1,1→2,2→3,3→0 (wraparound pair
    // 3-0 IS ring distance 1) + one self message 2→2.
    // Bin 1 (ts 50..100): hotspot — 0,1,2 all send twice to rank 3.
    val ev = sends(
      (0L, 10L, 0, 1), (10L, 10L, 1, 2), (20L, 10L, 2, 3), (30L, 10L, 3, 0),
      (40L, 5L, 2, 2),
      (60L, 20L, 0, 3), (70L, 20L, 0, 3), (80L, 20L, 1, 3), (90L, 20L, 1, 3),
      (95L, 20L, 2, 3), (100L, 20L, 2, 3))
    val got = CommOps.commStructure(ev, bins = 2).collect()
      .map(r => r.getInt(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap
    // (n_msgs, bytes, n_pairs, n_senders, n_receivers, max_pair, self, ring)
    assert(got(0) == Seq(5L, 45L, 5L, 4L, 4L, 1L, 1L, 4L))
    // hotspot bin: 0→3 wraps to ring distance 1, like 2→3; 1→3 is dist 2
    assert(got(1) == Seq(6L, 120L, 3L, 3L, 1L, 2L, 0L, 4L))
  }

  test("latency model: exact integer sufficient statistics per channel") {
    // channel 0→1: (len 4, lat 15 ms) and (len 6, lat 40 ms)
    val ev = Seq(
      (0L, 10000000L, "MpiSend", 0, 1, 4L),
      (1L, 30000000L, "MpiSend", 0, 1, 6L),
      (2L, 25000000L, "MpiRecv", 1, 0, 0L),
      (3L, 70000000L, "MpiRecv", 1, 0, 0L)
    ).toDF("id", "ts", "nm", "proc", "peer", "len")
      .select(col("id").as(EventId), col("ts").as(TimestampNs),
        col("nm").as(Name), col("proc").as(Process),
        col("peer").as(AttrReceiver), col("len").as(AttrMsgLength),
        lit("Instant").as(EventType))
    val r = CommOps.latencyModel(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n") == 2L)
    assert(row.getAs[Long]("sum_x") == 10L)
    assert(row.getAs[Long]("sum_y") == 55L)
    assert(row.getAs[Long]("sum_xy") == 4L * 15 + 6L * 40)
    assert(row.getAs[Long]("sum_x2") == 16L + 36L)
  }
}
