package graft

import org.apache.spark.sql.functions._

import graft.scale.Sketches

class HistQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exact order statistics at rank ceil(q*n/1000) on a known set") {
    // values 1..100 → p50 = 50th smallest = 50, p90 = 90, p99 = 99
    val df = (1L to 100L).toDF("x")
    val out = Sketches.histQuantiles(df, "x", bins = 8,
        perMille = Seq(500, 900, 990))
      .orderBy("per_mille")
      .select("per_mille", "n", "exact")
      .as[(Int, Long, Long)].collect()
    assert(out === Seq((500, 100L, 50L), (900, 100L, 90L), (990, 100L, 99L)))
  }

  test("estimate is the containing bin's lower edge, error bounded by bin width") {
    val df = (1L to 100L).toDF("x")
    val rows = Sketches.histQuantiles(df, "x", bins = 10)
      .select("est", "exact", "abs_err").as[(Long, Long, Long)].collect()
    val width = 100L / 10 + 1 // ceil-ish bound on (hi-lo+1)/bins
    rows.foreach { case (est, exact, err) =>
      assert(err === math.abs(exact - est))
      assert(err <= width, s"estimate off by $err > bin width $width")
      assert(est <= exact, "lower edge cannot exceed the true value")
    }
  }

  test("skewed data: rank still lands in the right bin") {
    // 990 copies of 0 and ten large values → p99 rank 990·1000/1000=990 → 0;
    // p999 → rank 999 → the 9th large value
    val df = (Seq.fill(990)(0L) ++ (1L to 10L).map(_ * 1000L)).toDF("x")
    val out = Sketches.histQuantiles(df, "x", bins = 16,
        perMille = Seq(990, 999))
      .orderBy("per_mille").select("per_mille", "exact")
      .as[(Int, Long)].collect()
    assert(out === Seq((990, 0L), (999, 9000L)))
  }

  test("constant column degenerates to one bin") {
    val df = Seq.fill(7)(42L).toDF("x")
    val out = Sketches.histQuantiles(df, "x", bins = 4,
        perMille = Seq(500))
      .select("est", "exact", "abs_err").as[(Long, Long, Long)].head()
    assert(out === ((42L, 42L, 0L)))
  }

  test("per-key variant matches per-key rank selection") {
    val df = (Seq.tabulate(100)(i => ("a", (i + 1).toLong)) ++
      Seq.tabulate(10)(i => ("b", (i * 100).toLong))).toDF("k", "x")
    val out = Sketches.histQuantilesByKey(df, "k", "x", bins = 8)
      .orderBy("k", "per_mille")
      .select("k", "per_mille", "exact").as[(String, Int, Long)].collect()
    // a: ranks 50/90/99 of 1..100; b: ranks 5/9/10 of 0,100,...,900
    assert(out === Seq(
      ("a", 500, 50L), ("a", 900, 90L), ("a", 990, 99L),
      ("b", 500, 400L), ("b", 900, 800L), ("b", 990, 900L)))
  }

  test("per-key estimate stays below the exact value (lower bin edge)") {
    val df = (1L to 97L).map(v => ("z", v)).toDF("k", "x")
    Sketches.histQuantilesByKey(df, "k", "x", bins = 10)
      .select("est", "exact").as[(Long, Long)].collect()
      .foreach { case (est, exact) => assert(est <= exact) }
  }

  test("weighted quantiles cross at the running-weight rank") {
    // values 1..4 with weights 1,1,1,7 → W=10; p50 rank 5 → running
    // weights 1,2,3,10 cross at value 4; p250 rank 3 → value 3
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 7L)).toDF("x", "wt")
    val out = Sketches.histQuantilesWeighted(df, "x", "wt", bins = 4,
        perMille = Seq(250, 500))
      .orderBy("per_mille")
      .select("per_mille", "total_weight", "exact")
      .as[(Int, Long, Long)].collect()
    assert(out === Seq((250, 10L, 3L), (500, 10L, 4L)))
  }

  test("weighted with unit weights equals the unweighted exact values") {
    val df = (1L to 200L).map(v => (v, 1L)).toDF("x", "wt")
    val w = Sketches.histQuantilesWeighted(df, "x", "wt")
      .select("per_mille", "exact").as[(Int, Long)].collect().toMap
    val u = Sketches.histQuantiles((1L to 200L).toDF("x"), "x")
      .select("per_mille", "exact").as[(Int, Long)].collect().toMap
    assert(w === u)
  }

  test("no corpus-sized single-partition exchange in the plan") {
    val df = (1L to 1000L).toDF("x").repartition(7)
    val plan = Sketches.histQuantiles(df, "x")
      .queryExecution.executedPlan.toString
    // the only single-partition window allowed is over the ≤bins
    // aggregated rows; the raw values must never hit one task — guard
    // by checking the heavy side: the refine join is broadcast
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"refine phase not broadcast:\n${plan.take(2000)}")
  }
}
