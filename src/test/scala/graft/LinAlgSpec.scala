package graft

import org.apache.spark.sql.functions._

import graft.scale.LinAlg

class LinAlgSpec extends SparkSpec {
  import spark.implicits._

  test("gram matrix matches a hand computation, upper triangle only") {
    val df = Seq(
      Seq(1.0f, 2.0f),
      Seq(3.0f, -1.0f)
    ).toDF("embedding")
    val out = LinAlg.gramMicro(df, "embedding").orderBy("i", "j")
      .as[(Int, Int, Long)].collect()
    // micro ints: (1e6, 2e6), (3e6, -1e6)
    // s11 = 1e12 + 9e12 = 1e13; s12 = 2e12 − 3e12 = −1e12
    // s22 = 4e12 + 1e12 = 5e12
    assert(out === Seq(
      (1, 1, 10000000000000L),
      (1, 2, -1000000000000L),
      (2, 2, 5000000000000L)))
  }

  test("floor micro-scaling truncates toward -inf like the oracle") {
    val df = Seq(Seq(0.0000015f, -0.0000015f)).toDF("embedding")
    val out = LinAlg.gramMicro(df, "embedding").orderBy("i", "j")
      .as[(Int, Int, Long)].collect()
    // 0.0000015f = 1.4999999621... e-6 → floor(·1e6) = 1;
    // its negation → floor = −2 (floor, not trunc)
    assert(out === Seq((1, 1, 1L), (1, 2, -2L), (2, 2, 4L)))
  }

  test("partition-count invariance: partials sum to the same matrix") {
    val vecs = (1 to 97).map(i =>
      Seq(i / 100.0f, (i % 7 - 3) / 10.0f, 0.5f))
    val one = LinAlg.gramMicro(vecs.toDF("embedding").coalesce(1),
      "embedding").orderBy("i", "j").as[(Int, Int, Long)].collect()
    val many = LinAlg.gramMicro(
      vecs.toDF("embedding").repartition(13),
      "embedding").orderBy("i", "j").as[(Int, Int, Long)].collect()
    assert(one === many)
    assert(one.length === 6)
  }

  test("covariance numerator matches the hand-centered computation") {
    val df = Seq(
      Seq(1.0f, 0.0f),
      Seq(3.0f, 2.0f)
    ).toDF("embedding")
    val out = LinAlg.covNumMicro(df, "embedding").orderBy("i", "j")
      .as[(Int, Int, Long)].collect()
    // micro: x1=(1e6,0), x2=(3e6,2e6); n=2; s=(4e6,2e6)
    // S11=1e13, S12=6e12, S22=4e12
    // cov11 = 2·1e13 − 16e12 = 4e12 (n²·var: var=1, 4·1·1e12 ✓)
    // cov12 = 2·6e12 − 8e12  = 4e12
    // cov22 = 2·4e12 − 4e12  = 4e12
    assert(out === Seq(
      (1, 1, 4000000000000L),
      (1, 2, 4000000000000L),
      (2, 2, 4000000000000L)))
  }

  test("empty partitions contribute nothing") {
    val df = Seq(Seq(1.0f, 1.0f)).toDF("embedding").repartition(8)
    val out = LinAlg.gramMicro(df, "embedding").count()
    assert(out === 3L)
  }
}
