package graft

import graft.analysis.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions have zero TV") {
    val df = (0 until 100).flatMap(i =>
      Seq(("a", (i % 10).toLong, 0), ("a", (i % 10).toLong, 1)))
      .toDF("k", "v", "s")
    val (n1, n2, tv) = Drift.tvDrift(df, "k", "v", "s")
      .select("n1", "n2", "tv_num").as[(Long, Long, Long)].head()
    assert((n1, n2, tv) === ((100L, 100L, 0L)))
  }

  test("disjoint supports have maximal TV (tv_num = 2·n1·n2)") {
    // side 0 all zeros, side 1 all large → no shared bin
    val df = (Seq.fill(40)(0L).map(v => ("a", v, 0)) ++
      Seq.fill(60)(1000L).map(v => ("a", v, 1))).toDF("k", "v", "s")
    val tv = Drift.tvDrift(df, "k", "v", "s")
      .select("tv_num").as[Long].head()
    assert(tv === 2L * 40L * 60L)
  }

  test("hand-checked asymmetric shift, unequal sample sizes") {
    // bins over pooled range 0..3 with 4 bins → bin = value
    // side0: [0,0,1] (n1=3)  side1: [1,3] (n2=2)
    // per bin |c1·n2−c2·n1|: b0 |2·2−0|=4, b1 |1·2−1·3|=1, b3 |0−1·3|=3
    val df = Seq(("a", 0L, 0), ("a", 0L, 0), ("a", 1L, 0),
      ("a", 1L, 1), ("a", 3L, 1)).toDF("k", "v", "s")
    val (n1, n2, tv) = Drift.tvDrift(df, "k", "v", "s", bins = 4)
      .select("n1", "n2", "tv_num").as[(Long, Long, Long)].head()
    assert((n1, n2, tv) === ((3L, 2L, 8L)))
  }

  test("keys bin independently over their own pooled range") {
    val df = Seq(("a", 0L, 0), ("a", 100L, 1),
      ("b", 5L, 0), ("b", 5L, 1)).toDF("k", "v", "s")
    val out = Drift.tvDrift(df, "k", "v", "s")
      .select("k", "tv_num").as[(String, Long)].collect().toMap
    assert(out("a") === 2L) // disjoint singletons: 2·1·1
    assert(out("b") === 0L)
  }
}
