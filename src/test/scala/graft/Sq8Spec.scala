package graft

import org.apache.spark.sql.functions._

import graft.functions.VecQuant
import graft.scale.Similarity

/** SQ8 scalar quantization: code range/monotonicity, reconstruction
  * bound, fused-instance codegen, and symmetric search self-consistency. */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private val mins = Array(0.0, -1.0, 5.0)
  private val maxs = Array(1.0, 1.0, 5.0) // dim 2 constant

  test("codes are in [0,255], extremes map to 0/255, constant dim to 0") {
    val df = Seq(
      (1L, Seq(0.0f, -1.0f, 5.0f)),
      (2L, Seq(1.0f, 1.0f, 5.0f)),
      (3L, Seq(0.5f, 0.0f, 5.0f))).toDF("vec_id", "embedding")
    val codes = df.select(col("vec_id"),
      VecQuant.sq8(col("embedding"), mins, maxs).as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == Seq(0, 0, 0))
    assert(codes(2L) == Seq(255, 255, 0))
    assert(codes(3L) == Seq(127, 127, 0))
  }

  test("two fused instances in one projection stay correct (codegen)") {
    val df = Seq((1L, Seq(0.25f, 0.5f, 5.0f))).toDF("vec_id", "embedding")
    val r = df.select(
      VecQuant.sq8(col("embedding"), mins, maxs).as("a"),
      VecQuant.sq8(col("embedding"), Array(0.0, 0.0, 0.0), Array(2.0, 2.0, 10.0)).as("b"))
      .collect().head
    assert(r.getSeq[Int](0) == Seq(63, 191, 0))
    assert(r.getSeq[Int](1) == Seq(31, 63, 127))
  }

  test("reconstruction error is bounded by one quantization step") {
    val vecs = (0 until 50).map(i => (i.toLong,
      Seq.tabulate(4)(d => ((i * 31 + d * 17) % 97 / 97.0f) - 0.3f)))
      .toDF("vec_id", "embedding")
    val (mn, mx) = Similarity.sq8Fit(vecs, dim = 4)
    val rows = Similarity.sq8Codes(vecs, mn, mx).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val orig = (0 until 50).map(i => i.toLong ->
      Seq.tabulate(4)(d => ((i * 31 + d * 17) % 97 / 97.0f) - 0.3f)).toMap
    for ((id, cs) <- rows; d <- cs.indices) {
      val step = (mx(d) - mn(d)) / 255.0
      val rec = mn(d) + (cs(d) + 0.5) * step
      assert(math.abs(rec - orig(id)(d)) <= step,
        s"vec $id dim $d: rec $rec vs ${orig(id)(d)} step $step")
    }
  }

  test("sq8TopK ranks by exact integer code distance with id tie-break") {
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.1f, 0.1f)),
      (2L, Seq(0.9f, 0.9f)), (3L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val (mn, mx) = Similarity.sq8Fit(vecs, dim = 2)
    val top = Similarity.sq8TopK(vecs, vecs.filter(col("vec_id") === 0), 3, mn, mx)
      .orderBy(col("rank")).collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }
}
