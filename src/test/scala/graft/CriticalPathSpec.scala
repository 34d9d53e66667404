package graft

import org.apache.spark.sql.functions._

import graft.analysis.CriticalPath
import graft.model.Schemas._

/** Stall-chain extraction: planted blame chains are recovered hop by
  * hop, symmetric stalls cannot cycle, and no stalls means no chain. */
class CriticalPathSpec extends SparkSpec {
  import spark.implicits._

  private def trace(rows: (Long, Long, String, Int, Int)*) =
    rows.toDF("id", "ts", "nm", "proc", "peer")
      .select(col("id").as(EventId), col("ts").as(TimestampNs),
        col("nm").as(Name), col("proc").as(Process),
        col("peer").as(AttrReceiver), lit("Instant").as(EventType))

  test("a planted three-stall chain is walked back to its origin") {
    // stall C: 1->0 send@100 recv@90 (root, latest recv)
    // stall B: 2->1 send@80  recv@70 (pred of C: at C's sender 1)
    // stall A: 3->2 send@60  recv@50 (pred of B)
    val ev = trace(
      (0L, 100L, "MpiSend", 1, 0), (1L, 90L, "MpiRecv", 0, 1),
      (2L, 80L, "MpiSend", 2, 1), (3L, 70L, "MpiRecv", 1, 2),
      (4L, 60L, "MpiSend", 3, 2), (5L, 50L, "MpiRecv", 2, 3))
    val got = CriticalPath.stallChain(ev).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))
    assert(got.toSeq == Seq((0L, 1, 0, 10L), (1L, 2, 1, 10L), (2L, 3, 2, 10L)))
  }

  test("symmetric A<->B stalls terminate instead of cycling") {
    // m1: 0->1 send@100 recv@90; m2: 1->0 send@95 recv@85
    // root = m1 (recv 90); pred(m1) = stall at 0 with recv < 90 → m2;
    // pred(m2) = stall at 1 with recv < 85 → none (m1's recv is 90)
    val ev = trace(
      (0L, 100L, "MpiSend", 0, 1), (1L, 90L, "MpiRecv", 1, 0),
      (2L, 95L, "MpiSend", 1, 0), (3L, 85L, "MpiRecv", 0, 1))
    val got = CriticalPath.stallChain(ev).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((0L, 0, 1), (1L, 1, 0)))
  }

  test("chains longer than one doubling round assemble correctly") {
    // 8 stalls in a line: p+1 -> p, recv times strictly decreasing;
    // localThreshold = 0 forces the distributed pointer-doubling path,
    // the default exercises the driver-side walk — results must agree
    val ev = trace((0 until 8).flatMap { i =>
      val base = 1000L - i * 100
      Seq((i * 2L, base, "MpiSend", i + 1, i),
        (i * 2L + 1, base - 10, "MpiRecv", i, i + 1))
    }: _*)
    for (thresh <- Seq(0L, CriticalPath.LocalWalkThreshold)) {
      val got = CriticalPath.stallChain(ev, localThreshold = thresh).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(got.toSeq == (0 until 8).map(i => (i.toLong, i + 1)),
        s"localThreshold=$thresh")
    }
  }

  test("critical path agrees between local-walk and doubling paths") {
    val ev = trace(
      (0L, 100L, "MpiSend", 1, 0), (1L, 90L, "MpiRecv", 0, 1),
      (2L, 80L, "MpiSend", 2, 1), (3L, 70L, "MpiRecv", 1, 2),
      (4L, 60L, "MpiSend", 3, 2), (5L, 50L, "MpiRecv", 2, 3))
    val local = CriticalPath.criticalPath(ev).collect().map(_.toSeq)
    val dist = CriticalPath.criticalPath(ev, localThreshold = 0)
      .collect().map(_.toSeq)
    assert(local.toSeq == dist.toSeq)
  }

  test("no stalls yields an empty chain with the right schema") {
    // send strictly before recv: not late
    val ev = trace((0L, 10L, "MpiSend", 0, 1), (1L, 20L, "MpiRecv", 1, 0))
    val out = CriticalPath.stallChain(ev)
    assert(out.columns.toSeq ==
      Seq("hop", "src", "dst", "send_ts", "recv_ts", "wait_ns"))
    assert(out.count() == 0)
  }

  test("critical path interleaves waits with the compute between them") {
    // same three-stall chain; arrival-order descent gives the same walk,
    // and each hop's compute segment spans [pred's arrival, this send]
    val ev = trace(
      (0L, 100L, "MpiSend", 1, 0), (1L, 90L, "MpiRecv", 0, 1),
      (2L, 80L, "MpiSend", 2, 1), (3L, 70L, "MpiRecv", 1, 2),
      (4L, 60L, "MpiSend", 3, 2), (5L, 50L, "MpiRecv", 2, 3))
    val got = CriticalPath.criticalPath(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, "wait", 0, 90L, 100L, 10L),
      (1L, "compute", 1, 80L, 100L, 20L),   // B arrived at 1 @80, sent @100
      (2L, "wait", 1, 70L, 80L, 10L),
      (3L, "compute", 2, 60L, 80L, 20L),    // A arrived at 2 @60, sent @80
      (4L, "wait", 2, 50L, 60L, 10L),
      (5L, "compute", 3, 60L, 60L, 0L)))    // origin: proc 3's first event
  }

  test("critical path compute durations are non-negative and terminate") {
    val ev = trace(
      (0L, 100L, "MpiSend", 0, 1), (1L, 90L, "MpiRecv", 1, 0),
      (2L, 95L, "MpiSend", 1, 0), (3L, 85L, "MpiRecv", 0, 1))
    val got = CriticalPath.criticalPath(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, "wait", 1, 10L), (1L, "compute", 0, 5L),
      (2L, "wait", 0, 10L), (3L, "compute", 1, 5L)))
    assert(got.forall(_._4 >= 0))
  }

  test("a 100-hop chain needs several doubling rounds and stays exact") {
    // 100 stalls in a line — log2(100) ≈ 7 doubling rounds; forces the
    // distributed path with localThreshold = 0
    val n = 100
    val ev = trace((0 until n).flatMap { i =>
      val base = 100000L - i * 100
      Seq((i * 2L, base, "MpiSend", i + 1, i),
        (i * 2L + 1, base - 10, "MpiRecv", i, i + 1))
    }: _*)
    val got = CriticalPath.stallChain(ev, localThreshold = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.length == n)
    assert(got.toSeq == (0 until n).map(i => (i.toLong, i + 1)))
  }

  test("a 4096-hop planted chain in noise is recovered exactly (12 rounds)") {
    // realistic-size doubling: log2(4096) = 12 pointer-squaring rounds.
    // 500 decoy stalls live on disjoint processes at EARLIER recv times —
    // they are predecessors of nothing on the chain and must not leak in.
    val n = 4096
    val chain = (0 until n).flatMap { i =>
      val base = 10000000L - i * 100
      Seq((i * 2L, base, "MpiSend", i + 1, i),
        (i * 2L + 1, base - 10, "MpiRecv", i, i + 1))
    }
    val noise = (0 until 500).flatMap { j =>
      val base = 1000L + j * 2 // all far earlier than any chain recv
      Seq((100000L + j * 2, base, "MpiSend", 10000 + j, 20000 + j),
        (100001L + j * 2, base - 1, "MpiRecv", 20000 + j, 10000 + j))
    }
    val ev = trace(scala.util.Random.shuffle(chain ++ noise): _*)
    val got = CriticalPath.stallChain(ev, localThreshold = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.length == n)
    assert(got.toSeq == (0 until n).map(i => (i.toLong, i + 1, i)))
  }

  test("a 5000-stall planted chain forces many doubling rounds and " +
      "agrees with the driver-side walk") {
    // realistic chain length: ⌈log₂ 5000⌉ = 13 pointer-doubling rounds
    // (the 8-stall case above only exercises 3); same line topology —
    // stall i is at the sender of stall i−1, recv times strictly
    // decreasing, wait 5 ns each
    val n = 5000
    val ev = trace((0 until n).flatMap { i =>
      val recv = 10L * (n - i) // decreasing in i, all positive
      Seq((i * 2L, recv + 5, "MpiSend", i + 1, i),
        (i * 2L + 1, recv, "MpiRecv", i, i + 1))
    }: _*)
    val dist = CriticalPath.stallChain(ev, localThreshold = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))
      .sortBy(_._1)
    assert(dist.length == n)
    assert(dist.head == (0L, 1, 0, 5L))
    assert(dist.last == ((n - 1).toLong, n, n - 1, 5L))
    assert(dist.forall(_._4 == 5L), "every hop waits exactly 5 ns")
    // the driver-side walk (default threshold) must produce the same chain
    val local = CriticalPath.stallChain(ev).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))
      .sortBy(_._1)
    assert(local.toSeq == dist.toSeq)
  }

  test("critical path on a stall-free trace is empty with the right schema") {
    val ev = trace((0L, 10L, "MpiSend", 0, 1), (1L, 20L, "MpiRecv", 1, 0))
    val out = CriticalPath.criticalPath(ev)
    assert(out.columns.toSeq ==
      Seq("seq", "kind", "process", "t0_ns", "t1_ns", "dur_ns"))
    assert(out.count() == 0)
  }
}
