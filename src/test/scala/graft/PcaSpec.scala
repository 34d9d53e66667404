package graft

import org.apache.spark.sql.functions._

import graft.scale.LinAlg

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // planted 3-d data: dominant direction u = (2,1,0)/√5 with amplitude
  // s·a (s = ±1, a = 1..8), minor direction w = (-1,2,0)/√5 with a
  // per-a amplitude t_a·0.1·(9−a) that does NOT depend on s — for each
  // a the ± pair shares the minor term, so the u/w cross-covariance
  // cancels exactly and the principal axes are the planted ones.
  // Constant offset 0.5 on dim 3 (pure mean, no variance).
  private val u = Array(2.0, 1.0, 0.0).map(_ / math.sqrt(5))
  private val w = Array(-1.0, 2.0, 0.0).map(_ / math.sqrt(5))
  private def planted = (1 to 8).flatMap { a =>
    val t = if (a % 2 == 0) 1 else -1
    Seq(1, -1).map { s =>
      val amp = s * a.toDouble
      val vec = (0 until 3).map(i =>
        (amp * u(i) + 0.1 * t * (9 - a) * w(i) + (if (i == 2) 0.5 else 0)).toFloat)
      ((a * 2 + s).toLong, vec)
    }
  }.toDF("vec_id", "embedding")

  private def stats = {
    val df = planted
    val g = LinAlg.gramMicro(df, "embedding")
      .as[(Int, Int, Long)].collect().toSeq
    val s = LinAlg.dimSumsMicro(df, "embedding")
      .select("i", "s").as[(Int, Long)].collect().toSeq
    LinAlg.covarianceFromStats(g, s, df.count())
  }

  test("power iteration recovers the planted dominant direction") {
    val (vals, vecs) = LinAlg.topEigen(stats, 2)
    val cos1 = math.abs(vecs(0).zip(u).map { case (a, b) => a * b }.sum)
    val cos2 = math.abs(vecs(1).zip(w).map { case (a, b) => a * b }.sum)
    assert(cos1 > 0.999, s"top component off the planted axis: |cos|=$cos1")
    assert(cos2 > 0.999, s"second component off the minor axis: |cos|=$cos2")
    assert(vals(0) > vals(1) && vals(1) > 0)
    // dim 3 is constant → centered covariance kills it: components
    // should have ~no mass there
    assert(math.abs(vecs(0)(2)) < 1e-6 && math.abs(vecs(1)(2)) < 1e-6)
  }

  test("eigenvalues are reduction-order reproducible via integer stats") {
    val df = planted.repartition(7)
    val g = LinAlg.gramMicro(df, "embedding").as[(Int, Int, Long)].collect().toSeq
    val s = LinAlg.dimSumsMicro(df, "embedding")
      .select("i", "s").as[(Int, Long)].collect().toSeq
    val c2 = LinAlg.covarianceFromStats(g, s, df.count())
    val (v1, _) = LinAlg.topEigen(stats, 2)
    val (v2, _) = LinAlg.topEigen(c2, 2)
    assert(v1.toSeq === v2.toSeq) // bit-identical, not just close
  }

  test("projection variance matches the eigenvalue and components decorrelate") {
    val df = planted
    val n = df.count()
    val (vals, vecs) = LinAlg.topEigen(stats, 2)
    val mu = {
      val s = LinAlg.dimSumsMicro(df, "embedding")
        .select("i", "s").as[(Int, Long)].collect()
      val m = new Array[Double](3)
      s.foreach { case (i, v) => m(i - 1) = v.toDouble / n / 1e6 }
      m
    }
    val proj = LinAlg.project(df, "embedding", "vec_id", mu, vecs)
      .select("proj").as[Seq[Double]].collect()
    def colv(c: Int) = proj.map(_(c))
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val (p0, p1) = (colv(0), colv(1))
    assert(math.abs(mean(p0.map(x => x * x)) - vals(0)) / vals(0) < 0.02)
    assert(math.abs(mean(p1.map(x => x * x)) - vals(1)) / vals(1) < 0.05)
    val cross = math.abs(mean(p0.zip(p1).map { case (a, b) => a * b }))
    assert(cross < 0.05 * math.sqrt(vals(0) * vals(1)),
      s"components not decorrelated: E[p0·p1]=$cross")
  }
}
