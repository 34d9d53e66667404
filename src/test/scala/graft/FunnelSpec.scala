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

  test("cohort retention counts distinct users per (cohort day, offset)") {
    val day = 86400000000L
    // u1,u2 start day 0; u1 returns day 1 twice (counted once), u2 never;
    // u3 starts day 1 and returns day 2
    val ev = Seq(
      (1L, 0L * day + 5), (2L, 0L * day + 9),
      (1L, 1L * day + 1), (1L, 1L * day + 2),
      (3L, 1L * day + 3), (3L, 2L * day + 4)
    ).toDF("user_id", "t_us")
    val m = Sessionize.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(m((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(m((0L, 1L)) == ((1L, 2L, 0.5)))
    assert(m((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(m((1L, 1L)) == ((1L, 1L, 1.0)))
    assert(m.size == 4)
  }

  test("transition counts follow each user's own timeline only") {
    // u1: a→b→a; u2: b→b — cross-user adjacency must not leak
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 30L, 102L, "a"),
      (2L, 15L, 103L, "b"), (2L, 25L, 104L, "b"))
      .toDF("user_id", "t", "id", "et")
    val got = Sessionize.transitions(ev, "user_id", "t", "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 1L)),
      ("b", "a") -> ((1L, 2L)),   // row_total for 'b' = b→a + b→b
      ("b", "b") -> ((1L, 2L))))
  }

  test("random projection is a deterministic fixed-width reduction") {
    import org.apache.spark.sql.functions._
    val emb = Seq((0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(-0.5f)))
      .toDF("vec_id", "embedding")
    val a = graft.scale.Similarity.randomProject(emb, outDim = 4)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(a.forall(_.length == 4))
    // planes are md5-fixed: antipodal inputs project antipodally
    assert(a(0).zip(a(1)).forall { case (x, y) => math.abs(x + y) < 1e-9 })
    val b = graft.scale.Similarity.randomProject(emb, outDim = 4)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
  }
}
