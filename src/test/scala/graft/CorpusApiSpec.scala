package graft

import org.apache.spark.sql.functions._

import graft.model.Corpus

/** The Corpus facade chains the document pipeline end to end and stays
  * a pure delegation (facade results equal direct operator calls). */
class CorpusApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Corpus(Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "b"),
    (3L, "completely different words appear here today now", "en", "a"),
    (4L, "x x x x x x x x x x x x", "en", "b")
  ).toDF("doc_id", "text", "lang", "source"))

  test("facade chains stats -> dedup -> curation -> ordering") {
    assert(corpus.textStats.count() === 4)
    assert(corpus.tokenCounts.filter(col("doc_id") === 1)
      .select("ws_tokens").as[Int].head() === 9)
    // docs 1 and 2 are exact duplicates
    val ex = corpus.exactDedup
    assert(ex.count() === 3)
    assert(ex.agg(sum("dup_count")).as[Long].head() === 4L)
    val comps = corpus.nearDupComponents()
    assert(comps.filter(col("node").isin(1L, 2L))
      .select("component").distinct().count() === 1)
    // splits keep the near-dup pair together
    val split = corpus.leakageSafeSplit(comps)
    assert(split.filter(col("doc_id").isin(1L, 2L))
      .select("split").distinct().count() === 1)
    // epoch order covers every doc exactly once
    val order = corpus.epochOrder(Seq("a" -> 2))
    assert(order.select("pos").as[Long].collect().sorted.toSeq === (0L to 3L))
  }

  test("facade equals direct operator calls") {
    val direct = graft.scale.TextOps.qualityScore(corpus.docs).collect()
    assert(corpus.qualityScore.collect() === direct)
  }
}
