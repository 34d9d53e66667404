package graft

import org.apache.spark.sql.functions._

import graft.functions.VecBits
import graft.scale.Similarity

/** Binary sign-bit quantization and Hamming-distance retrieval. */
class HammingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("sign pack sets one bit per strictly-positive dimension") {
    val df = Seq((1L, Array(1.0f, -1.0f, 0.0f, 2.0f))).toDF("vec_id", "embedding")
    val bits = df.select(VecBits.signPack(col("embedding")).as("b"))
      .head().getSeq[Long](0)
    assert(bits == Seq(9L)) // bits 0 and 3 (zero is NOT positive)
  }

  test("vectors longer than 32 dims span multiple 32-bit words") {
    val df = Seq((1L, Array.fill(40)(1.0f))).toDF("vec_id", "embedding")
    val bits = df.select(VecBits.signPack(col("embedding")).as("b"))
      .head().getSeq[Long](0)
    assert(bits == Seq(0xFFFFFFFFL, 0xFFL))
  }

  test("hamming is the popcount of the xor across words") {
    val df = Seq((Array(0xFFFFFFFFL, 0xFFL), Array(0L, 0xF0L)))
      .toDF("a", "b")
    assert(df.select(VecBits.hamming(col("a"), col("b"))).head().getInt(0)
      == 32 + 4) // word 0 fully flips; word 1 differs in 0x0F
  }

  test("hammingTopK ranks an identical vector first with distance 0") {
    val emb = Seq(
      (0L, Array(1.0f, -1.0f, 1.0f, -1.0f)),
      (1L, Array(2.0f, -2.0f, 3.0f, -9.0f)), // same sign pattern as 0
      (2L, Array(-1.0f, 1.0f, -1.0f, 1.0f)) // fully flipped: distance 4
    ).toDF("vec_id", "embedding")
    val top = Similarity.hammingTopK(emb, emb.filter($"vec_id" === 0), k = 2)
      .orderBy("rank").collect()
    assert(top.map(r => (r.getLong(2), r.getInt(3))).toSeq
      == Seq((1L, 0), (2L, 4)))
  }

  test("rerank orders hamming candidates by exact cosine") {
    // ids 1 and 2 tie at hamming 0 vs the query; cosine breaks the tie
    // toward the parallel vector, not the id order
    val emb = Seq(
      (0L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (1L, Array(9.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.hammingRerank(emb, emb.filter($"vec_id" === 0),
        k = 2, candidates = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 2L), (2, 1L))) // exact parallel wins
  }

  test("null elements pack as non-positive instead of corrupting the word") {
    val df = Seq((1L, Array[java.lang.Float](1.0f, null, 3.0f)))
      .toDF("vec_id", "embedding")
    val bits = df.select(VecBits.signPack(col("embedding")).as("b"))
      .head().getSeq[Long](0)
    assert(bits == Seq(5L)) // bits 0 and 2
  }
}
