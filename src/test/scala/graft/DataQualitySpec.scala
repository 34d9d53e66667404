package graft

import org.apache.spark.sql.functions._

import graft.scale.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (Some(1L), 10L, 1L),
    (Some(2L), 20L, 2L),
    (Some(2L), 99L, 3L), // duplicate key, out-of-range value
    (None, 30L, 4L)      // null key
  ).toDF("k", "v", "id")

  test("notNull / inRange / satisfies count exact violations") {
    assert(notNull(rows, "k").select("n_checked", "n_violations")
      .as[(Long, Long)].head() === ((4L, 1L)))
    assert(inRange(rows, "v", lit(10), lit(30))
      .select("n_violations").as[Long].head() === 1L)
    assert(satisfies(rows, "even_id", col("id") % 2 === 0)
      .select("n_violations").as[Long].head() === 2L)
  }

  test("unique counts every row of a duplicated key") {
    val out = unique(rows, Seq("k")).select("check", "n_checked", "n_violations")
      .as[(String, Long, Long)].head()
    assert(out === (("unique(k)", 4L, 2L)))
  }

  test("referential integrity counts orphans including null FKs") {
    val parent = Seq(1L, 2L).toDF("pk")
    val out = refIntegrity(rows, "k", parent, "pk")
      .select("n_checked", "n_violations").as[(Long, Long)].head()
    // all 4 children checked; the null-k row is an orphan (cannot join)
    assert(out === ((4L, 1L)))
  }

  test("benford counts leading digits of positives, shares sum to ~1e6") {
    val df = Seq(100L, 150L, 190L, 200L, 900L, -5L, 0L).toDF("v")
    val out = benford(df, "v").orderBy("digit")
      .select("digit", "n", "share_micro").as[(Int, Long, Long)].collect()
    assert(out.map(x => (x._1, x._2)).toSeq === Seq((1, 3L), (2, 1L), (9, 1L)))
    assert(out.map(_._3).sum >= 999998L && out.map(_._3).sum <= 1000000L)
  }

  test("report unions checks and never plans a cartesian product") {
    val parent = Seq(1L).toDF("pk")
    val rep = report(Seq(
      notNull(rows, "k"), unique(rows, Seq("k")),
      refIntegrity(rows, "k", parent, "pk")))
    assert(rep.count() === 3L)
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
