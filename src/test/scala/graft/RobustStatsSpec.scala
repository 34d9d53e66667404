package graft

import graft.analysis.RobustStats

/** Rank-selected order statistics: percentiles are values that exist in
  * the data at the integer rank ⌈p·n⌉, and MAD outliers flag exactly the
  * planted deviants. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("percentiles select the value at rank ceil(p*n)") {
    // key "a": 1..10 → n=10, p50 = rank 5 (ceil(10/2)) = 5,
    //          p90 = rank 9 = 9, max = 10
    // key "b": {7} → all three are 7
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toLong)) :+
      ("b", 7L, 99L)).toDF("k", "v", "id")
    val got = RobustStats.percentiles(df, "k", "v", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 10L, 5L, 9L, 10L), ("b", 1L, 7L, 7L, 7L)))
  }

  test("mad outliers flag exactly the planted deviants") {
    // tight cluster at 100±2 (median 100, MAD 1) + one wild value 200:
    // dev 100 > 5·1 → flagged; the ±2 neighbors are not
    val df = (Seq(98L, 99L, 100L, 101L, 102L, 200L).zipWithIndex
      .map { case (v, i) => ("a", v, i.toLong) }).toDF("k", "v", "id")
    val got = RobustStats.madOutliers(df, "k", "v", "id", 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq == Seq((5L, 200L, 100L, 1L, 100L)))
  }

  test("a value column literally named 'n' does not collide with ranking") {
    // regression: the internal window count was once also named "n" and
    // silently replaced the value column, turning the median into the
    // group size (found via q_daily_anomaly returning 0 rows)
    val df = Seq(("a", 10L, 0L), ("a", 10L, 1L), ("a", 10L, 2L),
      ("a", 1000L, 3L)).toDF("k", "n", "day")
    val got = RobustStats.madOutliers(df, "k", "n", "day", 3).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 1000L)))
  }

  test("mad of zero flags any deviation at all") {
    val df = Seq(("a", 5L, 0L), ("a", 5L, 1L), ("a", 5L, 2L), ("a", 6L, 3L))
      .toDF("k", "v", "id")
    val got = RobustStats.madOutliers(df, "k", "v", "id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 6L)))
  }

  test("equidepth reads boundaries at ceil(q*n/10), per key") {
    // n = 10: rank for q is exactly q, so boundary q = value q
    val a = (1 to 10).map(i => ("a", i.toLong, i.toLong))
    // n = 3: ranks collapse to 1,1,1,2,2,2,3,3,3 across q = 1..9
    val b = (1 to 3).map(i => ("b", (i * 100).toLong, i.toLong))
    val got = graft.analysis.RobustStats.equidepth(
        (a ++ b).toDF("k", "v", "id"), "k", "v", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == "a").map(x => (x._2, x._3)).toSeq ==
      (1 to 9).map(q => (q, q.toLong)))
    assert(got.filter(_._1 == "b").map(x => (x._2, x._3)).toSeq ==
      Seq(1 -> 100L, 2 -> 100L, 3 -> 100L, 4 -> 200L, 5 -> 200L,
        6 -> 200L, 7 -> 300L, 8 -> 300L, 9 -> 300L))
  }

  test("rolling median smooths a spike that wrecks the moving average") {
    import spark.implicits._
    // constant 10 with one 1000 spike at t=5, window 3
    val df = (0L to 9L).map(t => ("a", t, if (t == 5) 1000L else 10L))
      .toDF("k", "t", "v")
    val out = RobustStats.rollingMedian(df, "k", "t", "v", window = 3)
      .orderBy("t").select("roll_n", "roll_med")
      .as[(Long, Long)].collect()
    // expanding head: n=1 then 2; every 3-frame containing the spike
    // still has median 10 (two of three values are 10)
    assert(out.map(_._1).toSeq === Seq(1L, 2L) ++ Seq.fill(8)(3L))
    assert(out.map(_._2).forall(_ == 10L))
  }

  test("rolling median equals brute-force frame selection on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val vals = Seq.tabulate(50)(t => ("z", t.toLong, rng.nextInt(100).toLong))
    val out = RobustStats.rollingMedian(vals.toDF("k", "t", "v"),
        "k", "t", "v", window = 7)
      .orderBy("t").select("roll_med").as[Long].collect()
    vals.indices.foreach { i =>
      val frame = vals.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
      assert(out(i) === frame((frame.size + 1) / 2 - 1), s"at $i")
    }
  }
}
