package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamingOps.{IvIn, IvOut, IvState}

/** Streaming interval union: islands close on strict gaps exactly like
  * the batch running-max scan, the open island persists across batches,
  * disorder is flagged, and the final island flushes on key timeout. */
class StreamingIntervalSpec extends SparkSpec {

  import org.apache.spark.api.java.Optional

  private def state(timeout: Boolean, st: Option[IvState]): TestGroupState[IvState] = {
    val opt = st match {
      case Some(v) => Optional.of(v)
      case None => Optional.empty[IvState]()
    }
    TestGroupState.create[IvState](opt,
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = timeout)
  }

  test("overlap and touch merge, strict gap closes the island") {
    val live = state(timeout = false, None)
    val out = StreamingOps.ivGroup(None)(1L,
      Iterator(IvIn(1L, 0L, 10L), IvIn(1L, 5L, 12L), IvIn(1L, 12L, 20L),
        IvIn(1L, 25L, 30L)), live).toList
    // [0,10)+[5,12)+[12,20) merge; 25 > 20 closes the island
    assert(out == List(IvOut(1L, 0L, 20L, 3L, in_order = true)))
    assert(live.get == IvState(25L, 30L, 1L, inOrder = true, open = true))
  }

  test("the open island continues across batches") {
    val live = state(timeout = false,
      Some(IvState(25L, 30L, 1L, inOrder = true, open = true)))
    val out = StreamingOps.ivGroup(None)(1L,
      Iterator(IvIn(1L, 28L, 40L), IvIn(1L, 50L, 60L)), live).toList
    assert(out == List(IvOut(1L, 25L, 40L, 2L, in_order = true)))
    assert(live.get == IvState(50L, 60L, 1L, inOrder = true, open = true))
  }

  test("a span starting before the open island merges but is flagged") {
    val live = state(timeout = false,
      Some(IvState(25L, 30L, 1L, inOrder = true, open = true)))
    StreamingOps.ivGroup(None)(1L, Iterator(IvIn(1L, 20L, 26L)), live)
    assert(live.get == IvState(20L, 30L, 2L, inOrder = false, open = true))
  }

  test("key timeout flushes the open island and removes state") {
    val timedOut = state(timeout = true,
      Some(IvState(5L, 9L, 2L, inOrder = true, open = true)))
    val out = StreamingOps.ivGroup(Some("1 hour"))(1L, Iterator.empty, timedOut)
      .toList
    assert(out == List(IvOut(1L, 5L, 9L, 2L, in_order = true)))
    assert(timedOut.isRemoved)
  }
}
