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

  test("round-5 facade additions delegate and compose") {
    // rule verdicts, readability, diversity: per-doc / per-source shapes
    assert(corpus.gopherRules(minWords = 2L).count() === 4)
    assert(corpus.readability.filter(col("doc_id") === 4)
      .select("n_words").as[Long].head() === 12L)
    assert(corpus.distinctNgrams(Seq(1)).filter(col("source") === "b")
      .select("n_distinct").as[Long].head() > 0L)
    // soft dedup downweights the exact-dup pair below the unique doc
    val w = corpus.softDedupWeights().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_micro")).toMap
    assert(w(1L) == w(2L) && w(1L) < w(3L))
    // mix plan covers both sources within the budget arithmetic
    val mp = corpus.mixPlan(Seq("a" -> 1, "b" -> 1), 20L).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("target_tokens")).toMap
    assert(mp == Map("a" -> 10L, "b" -> 10L))
    // diff: one edited doc detected
    val b = corpus.docs.withColumn("text",
      when(col("doc_id") === 3, lit("edited")).otherwise(col("text")))
    val diff = corpus.diffAgainst(b)
      .filter(col("status") =!= "unchanged").collect()
    assert(diff.length === 1 && diff.head.getAs[Long]("doc_id") === 3L)
  }
}
