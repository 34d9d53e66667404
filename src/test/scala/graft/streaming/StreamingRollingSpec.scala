package graft.streaming

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamingOps.{CohortIn, RollOut, RollState}

/** Streaming trailing-window active-user contributions: per-user O(1)
  * state, exact parity with the batch rolling distinct count on in-order
  * streams, disorder flagged instead of silently undercounted. */
class StreamingRollingSpec extends SparkSpec {
  import spark.implicits._

  import org.apache.spark.api.java.Optional

  private def state(st: Option[RollState]): TestGroupState[RollState] = {
    val opt = st match {
      case Some(v) => Optional.of(v)
      case None => Optional.empty[RollState]()
    }
    TestGroupState.create[RollState](opt,
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = false)
  }

  test("contributions are contiguous, deduped, and window-shaped") {
    val live = state(None)
    val w = 3
    val out = StreamingOps.rollGroup(w, None)(1L,
      Iterator(CohortIn(1L, 10L), CohortIn(1L, 10L), CohortIn(1L, 11L)),
      live).toList
    // day 10 → dau + rolling {10,11,12}; repeat 10 → nothing;
    // day 11 → dau + rolling {13} (12 already emitted)
    assert(out.count(_.kind == "dau") == 2)
    assert(out.filter(_.kind == "rolling").map(_.day).sorted ==
      List(10L, 11L, 12L, 13L))
    assert(live.get == RollState(11L, 13L))
  }

  test("a day gap restarts contributions without covering the hole") {
    val live = state(Some(RollState(0L, 2L))) // active day 0, w=3
    val out = StreamingOps.rollGroup(3, None)(1L,
      Iterator(CohortIn(1L, 10L)), live).toList
    assert(out.filter(_.kind == "rolling").map(_.day) == List(10L, 11L, 12L))
  }

  test("out-of-order days flag as late instead of corrupting state") {
    val live = state(Some(RollState(10L, 12L)))
    val out = StreamingOps.rollGroup(3, None)(1L,
      Iterator(CohortIn(1L, 5L)), live).toList
    assert(out == List(RollOut(1L, 5L, "late", in_order = false)))
    assert(live.get == RollState(10L, 12L)) // untouched
  }

  test("randomized in-order streams: aggregated contributions == batch rollingActive") {
    val rng = new Random(23)
    val w = 7
    val dayUs = 86400000000L
    // 40 users × sorted event days in [0, 30)
    val events = (0L until 40L).flatMap { u =>
      val days = Seq.fill(1 + rng.nextInt(8))(rng.nextInt(30).toLong)
        .sorted
      days.map(d => (u, d * dayUs + u)) // in-order per user
    }
    val df = events.toDF("user_id", "t_us")
    val batch = graft.analysis.Sessionize.rollingActive(df, window = w)
      .select(col("day"), col("dau"), col("rolling_active"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // drive the group function per user over day-sorted events
    val contribs = events.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val live = state(None)
      StreamingOps.rollGroup(w, None)(u,
        evs.map { case (_, t) => CohortIn(u, t / dayUs) }.iterator, live).toList
    }
    assert(contribs.forall(_.in_order), "in-order stream must not flag late")
    val eventDays = events.map(_._2 / dayUs).toSet
    val dau = contribs.filter(_.kind == "dau").groupBy(_.day)
      .map { case (d, xs) => d -> xs.size.toLong }
    val rolling = contribs.filter(_.kind == "rolling").groupBy(_.day)
      .filter { case (d, _) => eventDays(d) } // batch reports event days only
      .map { case (d, xs) => d -> xs.size.toLong }
    assert(dau.keySet == batch.keySet)
    for ((d, (bDau, bRoll)) <- batch) {
      assert(dau(d) == bDau, s"dau mismatch at day $d")
      assert(rolling(d) == bRoll, s"rolling mismatch at day $d")
    }
  }
}
