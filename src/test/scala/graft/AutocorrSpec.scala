package graft

import org.apache.spark.sql.functions._

import graft.analysis.Autocorr

class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  test("lag stats over a hand-checked series with a gap") {
    // key "a": ticks 0,1,3 observed → grid 0..3 with x = (2, 4, 0, 6)
    val df = Seq(("a", 0L, 2L), ("a", 1L, 4L), ("a", 3L, 6L))
      .toDF("k", "t", "n")
    val out = Autocorr.lagStats(df, "k", "t", "n", Seq(1, 2))
      .orderBy("lag")
      .select("lag", "n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // lag 1 pairs: (2,4),(4,0),(0,6) → n=3 Σx=6 Σy=10 Σxy=8 Σx²=20 Σy²=52
    assert(out(0) === (1L, 3L, 6L, 10L, 8L, 20L, 52L))
    // lag 2 pairs: (2,0),(4,6)      → n=2 Σx=6 Σy=6 Σxy=24 Σx²=20 Σy²=36
    assert(out(1) === (2L, 2L, 6L, 6L, 24L, 20L, 36L))
  }

  test("constant series has r = 1 exactly from the integer stats") {
    val df = (0L to 9L).map(t => ("c", t, 5L)).toDF("k", "t", "n")
    val row = Autocorr.lagStats(df, "k", "t", "n", Seq(3))
      .select("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (n, sx, sy, sxy, sx2, sy2) = row
    // covariance numerator n·Σxy − Σx·Σy = 0 for a constant, and both
    // variance terms are 0 — the caller's r-definition degenerates the
    // same way in every engine because the stats are exact integers
    assert(n === 7L)
    assert(n * sxy - sx * sy === 0L)
    assert(n * sx2 - sx * sx === 0L)
    assert(n * sy2 - sy * sy === 0L)
  }

  test("perfect alternation is anti-correlated at lag 1") {
    val df = (0L to 9L).map(t => ("z", t, if (t % 2 == 0) 10L else 0L))
      .toDF("k", "t", "n")
    val (n, sx, sy, sxy, sx2, sy2) = Autocorr.lagStats(
        df, "k", "t", "n", Seq(1))
      .select("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val num = n * sxy - sx * sy
    val den2 = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    assert(num < 0L && num * num === den2, s"expected r = -1, got num=$num den2=$den2")
  }

  test("keys are independent and lags past the span vanish") {
    val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("b", 5L, 3L))
      .toDF("k", "t", "n")
    val out = Autocorr.lagStats(df, "k", "t", "n", Seq(1, 9))
      .select("k", "lag").as[(String, Long)].collect().toSet
    // "b" has a single tick → no pairs at any lag; "a" only lag 1
    assert(out === Set(("a", 1L)))
  }
}
