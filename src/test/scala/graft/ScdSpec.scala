package graft

import graft.analysis.Scd

/** SCD2 run compression: version boundaries at value changes (null-safe),
  * [valid_from, valid_to) chaining, open current version. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Int, Long, String, Long)]) =
    Scd.type2(rows.toDF("key", "ts", "attr", "tie"), "key", "ts", "attr", "tie")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2)).orNull,
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))

  test("runs compress into versions with chained validity") {
    val got = run(Seq(
      (1, 10L, "A", 0L), (1, 20L, "A", 0L), (1, 30L, "B", 0L),
      (1, 40L, "B", 0L), (1, 50L, "A", 0L)))
    assert(got.toSeq == Seq(
      (1, 1L, "A", 10L, 30L, 2L),
      (1, 2L, "B", 30L, 50L, 2L),
      (1, 3L, "A", 50L, -1L, 1L))) // reappearing value = NEW version
  }

  test("null attributes form their own runs under null-safe comparison") {
    val got = run(Seq(
      (2, 1L, null, 0L), (2, 2L, null, 0L), (2, 3L, "X", 0L)))
    assert(got.toSeq == Seq(
      (2, 1L, null, 1L, 3L, 2L),
      (2, 2L, "X", 3L, -1L, 1L)))
  }

  test("equal timestamps order by the tie column") {
    // at ts 10: tie 1 has "A", tie 2 has "B" → two versions, A first
    val got = run(Seq((3, 10L, "B", 2L), (3, 10L, "A", 1L)))
    assert(got.toSeq == Seq(
      (3, 1L, "A", 10L, 10L, 1L),
      (3, 2L, "B", 10L, -1L, 1L)))
  }

  test("single row is one open version") {
    val got = run(Seq((4, 7L, "Z", 0L)))
    assert(got.toSeq == Seq((4, 1L, "Z", 7L, -1L, 1L)))
  }
}
