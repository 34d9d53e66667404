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

  test("class overlap measures partial intersections, half-open") {
    // key 0: A[0,10) B[5,20)  → overlap [5,10) = 5
    //        A[30,40) B[40,50) → touching endpoints, no overlap
    //        A[60,70) A[65,80) B[75,90) → overlap [75,80) = 5 (stacked A)
    // key 1: only A → no overlap row
    val iv = Seq(
      (0, "A", 0L, 10L), (0, "B", 5L, 20L),
      (0, "A", 30L, 40L), (0, "B", 40L, 50L),
      (0, "A", 60L, 70L), (0, "A", 65L, 80L), (0, "B", 75L, 90L),
      (1, "A", 0L, 100L)
    ).toDF("process", "cls", "start", "end")
    val got = Concurrency.classOverlap(iv, "A", "B").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0) == ((10L, 2L)))
    assert(!got.contains(1))
    // class C spans are ignored entirely
    val withC = iv.union(Seq((0, "C", 0L, 1000L)).toDF("process", "cls", "start", "end"))
    assert(Concurrency.classOverlap(withC, "A", "B").collect()
      .map(r => r.getLong(1)).sum == 10L)
  }
}
