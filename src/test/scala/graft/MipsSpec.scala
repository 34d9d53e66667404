package graft

import org.apache.spark.sql.functions._

import graft.scale.Similarity

class MipsSpec extends SparkSpec {
  import spark.implicits._

  // MIPS ≠ cosine: a longer vector with worse angle can win on inner
  // product. Query (1,0); candidates: id 1 = (0.9, 0) aligned short,
  // id 2 = (2.0, 2.0) misaligned long (ip 2.0 beats 0.9 despite cos
  // 0.707 < 1.0), id 3 orthogonal.
  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.9f, 0.0f)),
    (2L, Seq(2.0f, 2.0f)),
    (3L, Seq(0.0f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("ranks by inner product, not cosine") {
    val out = Similarity.mipsTopK(corpus, corpus.filter($"vec_id" === 0), 3)
      .orderBy("rank")
      .select("rank", "neighbor_id", "ip")
      .as[(Int, Long, Double)].collect()
    assert(out.map(_._2).toSeq === Seq(2L, 1L, 3L))
    assert(out.head._3 === 2.0)
    val cosTop = Similarity.bruteForceTopK(
        corpus, corpus.filter($"vec_id" === 0), 1)
      .select("neighbor_id").as[Long].head()
    assert(cosTop === 1L, "cosine baseline should prefer the aligned vector")
  }

  test("self is excluded and k bounds the result") {
    val out = Similarity.mipsTopK(corpus, corpus.filter($"vec_id" === 0), 2)
    assert(out.count() === 2L)
    assert(out.filter($"neighbor_id" === 0).count() === 0L)
  }
}
