package graft

import graft.analysis.PatternDetect
import graft.model.Schemas._

/** Motif discovery on a planted periodic trace: N iterations of
  * loop{ work_a, work_b } with distinctive durations — detectPattern must
  * return windows that land on iteration boundaries of the series. */
class PatternDetectSpec extends SparkSpec {
  import spark.implicits._

  test("matrix profile kernel: periodic series has near-zero motif distance") {
    val y = Array.tabulate(64)(i => math.sin(i * math.Pi / 4) + (i % 8) * 0.1)
    val mp = PatternDetect.matrixProfile(y, 8)
    assert(mp.min < 1e-6) // exact repeats → z-norm distance ~0
  }

  test("distributed matrix profile is bit-equal to the local kernel") {
    val rng = new scala.util.Random(7)
    val y = Array.tabulate(400)(i =>
      if (i % 100 < 20) 50.0 + (i % 100) else rng.nextInt(100).toDouble)
    val local = graft.analysis.PatternDetect.matrixProfile(y, 20)
    val dist = graft.analysis.PatternDetect
      .matrixProfileDistributed(spark, y, 20, parallelism = 7)
    assert(local.length == dist.length)
    local.zip(dist).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"mp($i): $a != $b")
    }
  }

  test("detect pattern recovers planted loop iterations") {
    // trace on process 0: loop enter/leave bracketing 6 iterations of
    // (a, b, c) calls with per-iteration-identical durations
    val iters = 6
    val evs = scala.collection.mutable.ArrayBuffer[(Long, Long, String, String, Int)]()
    var id = 0L
    def add(ts: Long, et: String, name: String): Unit = {
      evs += ((id, ts, et, name, 0)); id += 1
    }
    add(0L, Enter, "loop")
    var t = 10L
    for (_ <- 0 until iters; (nm, dur) <- Seq(("a", 5L), ("b", 17L), ("c", 3L))) {
      add(t, Enter, nm); add(t + dur, Leave, nm); t += dur + 2
    }
    add(t + 5, Leave, "loop")
    val events = evs.toSeq.toDF(EventId, TimestampNs, EventType, Name, Process)

    val patterns = PatternDetect.detectPattern(events, "loop",
      iterations = Some(iters), windowSize = Some(3), process = 0,
      metric = TimeExc)
    assert(patterns.nonEmpty && patterns.length <= iters)
    // every occurrence covers exactly one (a,b,c) iteration: 3 enters with
    // exc durations {5,17,3}
    patterns.foreach { p =>
      val rows = p.filter(p(EventType) === Enter).collect()
      assert(rows.length == 3)
      assert(rows.map(_.getAs[Long](TimeExc)).toSet == Set(5L, 17L, 3L))
    }
  }
}
