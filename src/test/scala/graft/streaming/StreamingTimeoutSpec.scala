package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamingLsh.{BandRow, BucketState}
import graft.streaming.StreamingOps.{AsOfIn, AsOfState, FunnelIn, FunnelState}

/** Watermark-independent state-expiry for the flatMapGroupsWithState
  * operators (StreamingLsh buckets, asOfLatest, funnel): with an
  * idleTimeout configured, a timed-out invocation removes the group's
  * state (bounded memory over unbounded key domains), and normal
  * invocations arm the processing-time timer. Exercised through Spark's
  * public TestGroupState harness — the exact interface the engine drives. */
class StreamingTimeoutSpec extends SparkSpec {

  import org.apache.spark.api.java.Optional

  private def freshState[S](timeout: Boolean, st: Option[S]): TestGroupState[S] = {
    val opt = st match {
      case Some(v) => Optional.of(v)
      case None => Optional.empty[S]()
    }
    TestGroupState.create[S](opt, GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = timeout)
  }

  test("LSH bucket state is removed on timeout and timer armed otherwise") {
    val timedOut = freshState(timeout = true, Some(BucketState(List(1L, 2L))))
    val out = StreamingLsh.bucketGroup(32, Some("10 minutes"))(
      "b", Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved)

    val live = freshState[BucketState](timeout = false, None)
    val pairs = StreamingLsh.bucketGroup(32, Some("10 minutes"))(
      "b", Iterator(BandRow("b", 1L), BandRow("b", 2L)), live).toList
    assert(pairs.map(p => (p.a, p.b)) == List((1L, 2L)))
    assert(!live.isRemoved && live.getTimeoutTimestampMs.isPresent)
    // without a timeout the timer must NOT be armed (NoTimeout semantics)
    val plain = TestGroupState.create[BucketState](Optional.empty[BucketState](),
      GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long](), hasTimedOut = false)
    StreamingLsh.bucketGroup(32, None)("b", Iterator(BandRow("b", 3L)), plain)
    assert(!plain.getTimeoutTimestampMs.isPresent)
  }

  test("as-of per-key state is removed on timeout; a post-expiry left row is unmatched") {
    val timedOut = freshState(timeout = true, Some(AsOfState(5L, 7L, 1.0, hasRight = true)))
    val out = StreamingOps.asOfGroup(Some("1 hour"))(1L, Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved)

    // after expiry the key restarts cold: left rows see no right match
    val cold = freshState[AsOfState](timeout = false, None)
    val res = StreamingOps.asOfGroup(Some("1 hour"))(
      1L, Iterator(AsOfIn(1L, 10L, 1, 100L, 0.0)), cold).toList
    assert(res.map(_.r_id) == List(None))
    assert(cold.getTimeoutTimestampMs.isPresent)
  }

  test("funnel progress expires on timeout; the key then restarts from step one") {
    val timedOut = freshState(timeout = true, Some(FunnelState(List(1L, 2L))))
    val out = StreamingOps.funnelGroup(List("view", "click", "buy"), Some("1 day"))(
      1L, Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved)

    val cold = freshState[FunnelState](timeout = false, None)
    val res = StreamingOps.funnelGroup(List("view", "click", "buy"), Some("1 day"))(
      1L, Iterator(FunnelIn(1L, 50L, 1L, "click"), FunnelIn(1L, 60L, 2L, "view")), cold)
      .toList
    // progress restarted: only the first step matches (view at t=60)
    assert(res.map(r => (r.depth, r.t)) == List((1, 60L)))
    assert(cold.getTimeoutTimestampMs.isPresent)
  }
}
