package graft

import graft.analysis.Concurrency

/** Sweep-based concurrency profile: planted overlaps produce the known
  * duration-weighted level histogram, per key. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("overlapping spans yield the planted level histogram") {
    // key 0: [0,10), [5,15), [5,8)  → levels: [0,5)=1, [5,8)=3, [8,10)=2,
    //        [10,15)=1
    // key 1: [0,4), [6,8)           → [0,4)=1, [4,6)=0, [6,8)=1
    val iv = Seq((0, 0L, 10L), (0, 5L, 15L), (0, 5L, 8L),
      (1, 0L, 4L), (1, 6L, 8L)).toDF("process", "start", "end")
    val got = Concurrency.concurrencyProfile(iv).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (0, 1L, 10L, 2L),  // [0,5) + [10,15)
      (0, 2L, 2L, 1L),   // [8,10)
      (0, 3L, 3L, 1L),   // [5,8)
      (1, 0L, 2L, 1L),   // the gap [4,6)
      (1, 1L, 6L, 2L)))  // [0,4) + [6,8)
  }

  test("zero-length spans cancel out instead of inventing levels") {
    val iv = Seq((0, 5L, 5L), (0, 0L, 10L)).toDF("process", "start", "end")
    val got = Concurrency.concurrencyProfile(iv).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the zero-length span at 5 splits [0,10) into two level-1 segments
    assert(got.toSeq == Seq((1L, 10L)))
  }

  test("empty input yields an empty profile") {
    val iv = Seq.empty[(Int, Long, Long)].toDF("process", "start", "end")
    assert(Concurrency.concurrencyProfile(iv).count() == 0)
  }
}
