package graft

import org.apache.spark.sql.functions._

import graft.analysis.Profiles
import graft.enrich.EventMatcher
import graft.model.Schemas._

class IdleGapsSpec extends SparkSpec {
  import spark.implicits._

  // process 0: spans [0,10] gap 5 [15,20] gap 10 [30,40]; a nested child
  // [31,33] must NOT split its parent; process 1: one span (no gaps)
  private def raw = Seq(
    (0L, 0L, Enter, "a", 0), (1L, 10L, Leave, "a", 0),
    (2L, 15L, Enter, "b", 0), (3L, 20L, Leave, "b", 0),
    (4L, 30L, Enter, "c", 0), (5L, 31L, Enter, "c1", 0),
    (6L, 33L, Leave, "c1", 0), (7L, 40L, Leave, "c", 0),
    (8L, 5L, Enter, "x", 1), (9L, 9L, Leave, "x", 1)
  ).toDF(EventId, TimestampNs, EventType, Name, Process)

  private def trace = EventMatcher.enrich(raw)

  test("gaps between top-level spans, nested spans ignored, zero-fill") {
    val out = Profiles.idleGaps(trace)
      .orderBy(Process)
      .select(Process, "n_gaps", "idle_gap_total", "max_gap")
      .as[(Int, Long, Long, Long)].collect()
    assert(out === Seq((0, 2L, 15L, 10L), (1, 0L, 0L, 0L)))
  }

  test("minGapNs filters jitter") {
    val out = Profiles.idleGaps(trace, minGapNs = 5L)
      .filter(col(Process) === 0)
      .select("n_gaps", "idle_gap_total").as[(Long, Long)].head()
    assert(out === ((1L, 10L))) // only the 10-tick gap survives >5
  }

  test("identical under the bounded matcher mode (raw events in)") {
    val buffered = Profiles.idleGaps(raw).orderBy(Process).collect()
    graft.util.GraftConfig.setOption("matcher_mode", "bounded")
    try {
      val bounded = Profiles.idleGaps(raw).orderBy(Process).collect()
      assert(bounded.toSeq === buffered.toSeq)
    } finally graft.util.GraftConfig.resetOption("matcher_mode")
  }
}
