package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.analysis.TraceSample
import graft.model.Schemas._
import graft.streaming.StreamingOps.{SampIn, SampState}

/** Streaming call-tree sampling: batch parity on in-order streams,
  * state carried across micro-batches, disorder flagged not sampled. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  private def trace = {
    val rows = for {
      p <- 0 to 1
      c <- 0 until 20
      base = c * 1000L
      e <- Seq(
        (base, Enter, s"top_$c"), (base + 10, Enter, "mid"),
        (base + 20, Enter, "leaf"), (base + 30, Leave, "leaf"),
        (base + 40, Leave, "mid"), (base + 900, Leave, s"top_$c"))
    } yield (e._1 + p, e._2, e._3, p)
    rows.toDF(TimestampNs, EventType, Name, Process)
  }

  private def freshState = TestGroupState.create[SampState](
    Optional.empty[SampState](), GroupStateTimeout.NoTimeout,
    batchProcessingTimeMs = 1000L, Optional.empty[Long](),
    hasTimedOut = false)

  test("streaming twin samples exactly the batch set on in-order streams") {
    val batch = TraceSample.sampleCalls(trace, 2, 5)
      .select(col(Process), col(TimestampNs))
      .as[(Int, Long)].collect().toSet
    val byProc = trace.select(col(Process), col(TimestampNs),
        col(EventType), col(Name))
      .as[(Int, Long, String, String)].collect().groupBy(_._1)
    val streamed = byProc.flatMap { case (p, evs) =>
      val live = freshState
      // two micro-batches to prove state carries across (may split a tree)
      val (b1, b2) = evs.sortBy(_._2).splitAt(evs.length / 2)
      Seq(b1, b2).flatMap { b =>
        StreamingOps.sampGroup(2, 5, 7, None)(p,
          b.map(e => SampIn(p, e._2, e._3, e._4)).iterator, live).toList
      }
    }.toSeq
    assert(streamed.forall(_.in_order))
    assert(streamed.map(o => (o.p, o.ts)).toSet == batch)
  }

  test("an out-of-order event flags late and is not sampled") {
    val live = freshState
    StreamingOps.sampGroup(5, 5, 7, None)(0,
      Iterator(SampIn(0, 100L, Enter, "a"), SampIn(0, 200L, Leave, "a")),
      live).toList
    val out = StreamingOps.sampGroup(5, 5, 7, None)(0,
      Iterator(SampIn(0, 150L, Enter, "b")), live).toList
    assert(out.size == 1 && !out.head.in_order)
    assert(live.get.depth == 0L) // the late Enter did not disturb the depth
  }
}
