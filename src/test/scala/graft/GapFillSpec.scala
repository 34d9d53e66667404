package graft

import graft.analysis.GapFill

/** Grid densification: holes zero-filled per key between that key's own
  * bounds, cumulative unchanged by the inserted zeros. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("fills interior holes per key with zeros and keeps cumulative") {
    val df = Seq(("a", 10L, 2L), ("a", 13L, 5L), ("b", 11L, 1L))
      .toDF("key", "tick", "n")
    val got = GapFill.zeroFill(df, "key", "tick", "n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("a", 10L, 2L, 2L), ("a", 11L, 0L, 2L), ("a", 12L, 0L, 2L),
      ("a", 13L, 5L, 7L),
      ("b", 11L, 1L, 1L))) // b's grid is its own [11,11], not a's span
  }

  test("single-tick keys emit exactly one row") {
    val df = Seq(("k", 5L, 9L)).toDF("key", "tick", "n")
    val got = GapFill.zeroFill(df, "key", "tick", "n").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((5L, 9L, 9L)))
  }
}
