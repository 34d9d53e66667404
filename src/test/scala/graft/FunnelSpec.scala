package graft

import graft.analysis.Sessionize

/** Strictly-sequential funnel: order matters, stalls cascade, keys are
  * isolated. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def run(rows: (Long, String, Long)*) = {
    val ev = rows.toDF("user_id", "event_type", "t")
    Sessionize.funnel(ev, steps, "user_id", "t", "event_type")
      .collect().map { r =>
        r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getInt(4)))
      }.toMap
  }

  test("completes in order, earliest valid times chosen") {
    val m = run((1L, "view", 10L), (1L, "click", 20L), (1L, "click", 15L),
      (1L, "buy", 30L))
    assert(m(1L) == ((10L, 15L, 30L, 3)))
  }

  test("out-of-order steps do not count; stalls cascade") {
    // click BEFORE the first view -> step 2 never completes, nor step 3
    val m = run((2L, "click", 5L), (2L, "view", 10L), (2L, "buy", 30L))
    assert(m(2L) == ((10L, -1L, -1L, 1)))
  }

  test("equal timestamps are not strictly after (no same-instant credit)") {
    val m = run((3L, "view", 10L), (3L, "click", 10L))
    assert(m(3L) == ((10L, -1L, -1L, 1)))
  }

  test("keys are independent; users without step 1 are absent") {
    val m = run((4L, "view", 1L), (4L, "click", 2L),
      (5L, "click", 1L), (5L, "buy", 2L))
    assert(m(4L) == ((1L, 2L, -1L, 2)))
    assert(!m.contains(5L))
  }
}
