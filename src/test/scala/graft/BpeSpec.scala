package graft

import graft.scale.Bpe

/** BPE trainer on a hand-computable corpus: frequency-weighted pair
  * counts, deterministic tie-break, greedy left-to-right merge
  * application, early stop when no pairs remain. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges follow weighted counts and greedy replace") {
    // words: "aaa" ×2, "bb" ×1
    // iter1: (a,a) weight 2 words × 2 adjacent pairs = 4 > (b,b)=1 → merge a+a
    //        greedy: " a a a " → " aa a " (left-to-right, non-overlapping)
    // iter2: (aa,a) weight 2 → merge → " aaa "
    // iter3: only (b,b) weight 1 remains
    // iter4: no pairs anywhere → trainer stops early
    val docs = Seq("aaa bb", "aaa").toDF("text")
    val got = Bpe.learnMerges(docs, "text", nMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "a", "a", 4L),
      (2, "aa", "a", 2L),
      (3, "b", "b", 1L)))
  }

  test("ties break lexicographically on the pair") {
    // "ab" and "cd" once each: (a,b) and (c,d) both weight 1 → (a,b) first
    val docs = Seq("ab cd").toDF("text")
    val got = Bpe.learnMerges(docs, "text", nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", "b")))
  }

  test("local merge loop is bit-equal to the distributed loop") {
    // a corpus with weighted ties, overlapping pairs ("aaa"), shared
    // sentinel spaces between back-to-back occurrences ("abab"), and
    // single-char words that contribute no pairs
    val docs = Seq("aaa abab cc", "abab cc dd x", "aaa aaa dd", "x y")
      .toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val local = Bpe.learnMerges(docs, "text", nMerges = 6)
    // localVocabMax = 0 forces the gate onto the distributed branch
    val dist = Bpe.learnMerges(docs, "text", nMerges = 6, localVocabMax = 0)
    assert(rows(local) == rows(dist))
    assert(rows(local).nonEmpty)
  }

  test("tokenization lowercases and splits on non-letters") {
    // "Hello, HELLO!" → two occurrences of "hello" → (l,l) weight 2 wins
    // over single-occurrence pairs only via tie-break: all pairs in
    // "hello" appear twice; lexicographic min pair is (e,l)
    val docs = Seq("Hello, HELLO!").toDF("text")
    val got = Bpe.learnMerges(docs, "text", nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("e", "l", 2L)))
  }
}
