package graft

import org.apache.spark.sql.functions._
import graft.analysis.FuzzyJoin

/** Blocked Levenshtein self-match: in-block pairs within threshold,
  * cross-block pairs never compared, viral blocks droppable by cap. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val block = (n: org.apache.spark.sql.Column) =>
    element_at(split(n, " "), -1)

  test("finds close pairs within a block only") {
    val df = Seq("cold widget", "bold widget", "warm widget", "cold bolt")
      .toDF("name")
    val got = FuzzyJoin.selfPairs(df, "name", block, maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).sortBy(identity)
    // bold/cold distance 1; warm is 3+ from both; "cold bolt" is in
    // another block even though it is 4 edits from "cold widget"
    assert(got.toSeq == Seq(("bold widget", "cold widget", 1)))
  }

  test("distinct-value semantics: duplicate rows produce no self-pair") {
    val df = Seq("cold gear", "cold gear").toDF("name")
    assert(FuzzyJoin.selfPairs(df, "name", block, 2).count() == 0)
  }

  test("sorted-neighborhood: window pairs only, cross-window pairs absent") {
    // sorted order: apple, apply, azzzz, badge, badgy
    val df = Seq("apple", "apply", "badge", "badgy", "azzzz").toDF("name")
    val got = FuzzyJoin.sortedNeighborPairs(df, "name", window = 2, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .sortBy(identity)
    // window 2 compares adjacent ranks only: apple-apply (1) and
    // badge-badgy (1) qualify; apply-azzzz/azzzz-badge are > 2 edits, and
    // apple-badge is never compared (3 ranks apart)
    assert(got.toSeq == Seq(("apple", "apply", 1), ("badge", "badgy", 1)))
    // widening the window to 3 reaches rank distance 2 — apply-badge
    // (apply,azzzz,badge in sort order) now compared and within 5 edits —
    // while apple-badgy (rank distance 4) is still never compared
    val wide = FuzzyJoin.sortedNeighborPairs(df, "name", 3, 5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(wide.contains(("apply", "badge")))
    assert(!wide.contains(("apple", "badgy")))
  }

  test("maxBlockSize drops viral blocks entirely") {
    val df = Seq("a ring", "b ring", "c ring", "x hub", "y hub").toDF("name")
    val capped = FuzzyJoin.selfPairs(df, "name", block, 2, Some(2)).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(identity)
    // the 3-name "ring" block is dropped; the 2-name "hub" block stays
    assert(capped.toSeq == Seq(("x hub", "y hub")))
  }
}
