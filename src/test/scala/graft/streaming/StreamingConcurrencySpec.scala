package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamingOps.{ConcIn, ConcOut, ConcState}

/** Streaming concurrency segments: level transitions reproduce the
  * batch sweep per key, intra-tick deltas pre-sum, cross-batch chaining
  * continues from state, and late ticks are flagged not rewritten. */
class StreamingConcurrencySpec extends SparkSpec {

  import org.apache.spark.api.java.Optional

  private def state(timeout: Boolean, st: Option[ConcState]): TestGroupState[ConcState] = {
    val opt = st match {
      case Some(v) => Optional.of(v)
      case None => Optional.empty[ConcState]()
    }
    TestGroupState.create[ConcState](opt,
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = timeout)
  }

  test("segments match the batch sweep for planted overlapping spans") {
    // spans [0,10) and [5,8): deltas +1@0, +1@5, -1@8, -1@10
    val live = state(timeout = false, None)
    val out = StreamingOps.concGroup(None)(0L, Iterator(
      ConcIn(0L, 0L, 1L), ConcIn(0L, 5L, 1L),
      ConcIn(0L, 8L, -1L), ConcIn(0L, 10L, -1L)), live).toList
    assert(out == List(
      ConcOut(0L, 1L, 0L, 5L, in_order = true),
      ConcOut(0L, 2L, 5L, 8L, in_order = true),
      ConcOut(0L, 1L, 8L, 10L, in_order = true)))
    assert(live.get == ConcState(10L, 0L, started = true))
    // next batch continues the timeline from the stored state
    val next = StreamingOps.concGroup(None)(0L,
      Iterator(ConcIn(0L, 15L, 1L)), live).toList
    assert(next == List(ConcOut(0L, 0L, 10L, 15L, in_order = true)))
  }

  test("equal-timestamp deltas pre-sum, so intra-tick order cannot matter") {
    val live = state(timeout = false, None)
    // zero-length span at t=5 inside [0,10): net 0 at tick 5
    val out = StreamingOps.concGroup(None)(0L, Iterator(
      ConcIn(0L, 0L, 1L), ConcIn(0L, 5L, 1L), ConcIn(0L, 5L, -1L),
      ConcIn(0L, 10L, -1L)), live).toList
    assert(out == List(
      ConcOut(0L, 1L, 0L, 5L, in_order = true),
      ConcOut(0L, 1L, 5L, 10L, in_order = true)))
  }

  test("a late tick is flagged and folded forward, not rewritten") {
    val live = state(timeout = false, Some(ConcState(10L, 2L, started = true)))
    val out = StreamingOps.concGroup(None)(0L,
      Iterator(ConcIn(0L, 7L, -1L)), live).toList
    assert(out == List(ConcOut(0L, 2L, 7L, 7L, in_order = false)))
    assert(live.get == ConcState(10L, 1L, started = true),
      "level converges to the batch answer")
  }

  test("idle state expires on timeout") {
    val timedOut = state(timeout = true, Some(ConcState(1L, 1L, started = true)))
    val out = StreamingOps.concGroup(Some("1 hour"))(0L, Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved)
  }
}
