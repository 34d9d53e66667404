package graft

import org.apache.spark.sql.functions._

import graft.analysis.MergeApply

class MergeApplySpec extends SparkSpec {
  import spark.implicits._

  private def changes = Seq(
    // key 1: I then U — latest U wins
    (1L, 10L, 100L, "I", 5L),
    (1L, 20L, 101L, "U", 7L),
    // key 2: upsert then delete — absent from result
    (2L, 10L, 102L, "I", 1L),
    (2L, 30L, 103L, "D", 0L),
    // key 3: delete then a LATER insert — key reappears
    (3L, 10L, 104L, "D", 0L),
    (3L, 40L, 105L, "I", 9L),
    // key 4: equal seq — event_id tiebreak picks the higher id
    (4L, 50L, 106L, "U", 2L),
    (4L, 50L, 107L, "U", 3L)
  ).toDF("k", "seq", "event_id", "op", "v")

  test("last-writer-wins with delete tombstones and seq-tie tiebreak") {
    val out = MergeApply.applyCdc(changes, Seq("k"), "seq",
        Seq("event_id"), "op")
      .select("k", "op", "seq", "v").orderBy("k")
      .as[(Long, String, Long, Long)].collect()
    assert(out === Seq(
      (1L, "U", 20L, 7L),
      (3L, "I", 40L, 9L),
      (4L, "U", 50L, 3L)))
  }

  test("result carries every original column and no helper columns") {
    val out = MergeApply.applyCdc(changes, Seq("k"), "seq",
      Seq("event_id"), "op")
    assert(out.columns.toSeq === changes.columns.toSeq)
  }

  test("composite key partitions independently") {
    val df = Seq(
      (1L, "a", 1L, 1L, "U", 10L),
      (1L, "b", 2L, 2L, "D", 0L),
      (2L, "a", 3L, 3L, "U", 20L)
    ).toDF("k1", "k2", "seq", "event_id", "op", "v")
    val out = MergeApply.applyCdc(df, Seq("k1", "k2"), "seq",
        Seq("event_id"), "op")
      .select("k1", "k2", "v").orderBy("k1", "k2")
      .as[(Long, String, Long)].collect()
    assert(out === Seq((1L, "a", 10L), (2L, "a", 20L)))
  }

  test("plan shuffles on the merge key, not a global window") {
    val plan = MergeApply.applyCdc(changes, Seq("k"), "seq",
      Seq("event_id"), "op").queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window leaked into plan:\n$plan")
  }
}
