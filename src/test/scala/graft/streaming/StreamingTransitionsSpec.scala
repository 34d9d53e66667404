package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamingOps.{TransIn, TransOut, TransState}

/** Streaming transition emission: per-key last-state chaining matches
  * the batch lag-window semantics, disorder is flagged instead of
  * silently rewriting history, and idle state expires. */
class StreamingTransitionsSpec extends SparkSpec {

  import org.apache.spark.api.java.Optional

  private def state(timeout: Boolean, st: Option[TransState]): TestGroupState[TransState] = {
    val opt = st match {
      case Some(v) => Optional.of(v)
      case None => Optional.empty[TransState]()
    }
    TestGroupState.create[TransState](opt,
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = timeout)
  }

  test("in-order events chain through the stored last state") {
    val live = state(timeout = false, None)
    val out = StreamingOps.transGroup(None)(1L,
      Iterator(TransIn(1L, 10L, 100L, "a"), TransIn(1L, 20L, 101L, "b"),
        TransIn(1L, 30L, 102L, "a")), live).toList
    assert(out == List(
      TransOut(1L, "a", "b", 20L, in_order = true),
      TransOut(1L, "b", "a", 30L, in_order = true)))
    assert(live.get == TransState(30L, 102L, "a"))
    // the next batch continues the chain from the stored state
    val next = StreamingOps.transGroup(None)(1L,
      Iterator(TransIn(1L, 40L, 103L, "c")), live).toList
    assert(next == List(TransOut(1L, "a", "c", 40L, in_order = true)))
  }

  test("a late event is flagged, and the newest state is kept") {
    val live = state(timeout = false, Some(TransState(30L, 102L, "a")))
    val out = StreamingOps.transGroup(None)(1L,
      Iterator(TransIn(1L, 25L, 103L, "x")), live).toList
    assert(out == List(TransOut(1L, "a", "x", 25L, in_order = false)))
    assert(live.get == TransState(30L, 102L, "a"), "late row must not rewind")
  }

  test("idle state is removed on timeout and the timer armed otherwise") {
    val timedOut = state(timeout = true, Some(TransState(1L, 1L, "a")))
    val out = StreamingOps.transGroup(Some("1 hour"))(1L, Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved)

    val live = state(timeout = false, None)
    StreamingOps.transGroup(Some("1 hour"))(1L,
      Iterator(TransIn(1L, 10L, 1L, "a")), live)
    assert(live.getTimeoutTimestampMs.isPresent)
  }
}
