package graft

import graft.analysis.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions have zero TV") {
    val df = (0 until 100).flatMap(i =>
      Seq(("a", (i % 10).toLong, 0), ("a", (i % 10).toLong, 1)))
      .toDF("k", "v", "s")
    val (n1, n2, tv) = Drift.tvDrift(df, "k", "v", "s")
      .select("n1", "n2", "tv_num").as[(Long, Long, Long)].head()
    assert((n1, n2, tv) === ((100L, 100L, 0L)))
  }

  test("disjoint supports have maximal TV (tv_num = 2·n1·n2)") {
    // side 0 all zeros, side 1 all large → no shared bin
    val df = (Seq.fill(40)(0L).map(v => ("a", v, 0)) ++
      Seq.fill(60)(1000L).map(v => ("a", v, 1))).toDF("k", "v", "s")
    val tv = Drift.tvDrift(df, "k", "v", "s")
      .select("tv_num").as[Long].head()
    assert(tv === 2L * 40L * 60L)
  }

  test("hand-checked asymmetric shift, unequal sample sizes") {
    // bins over pooled range 0..3 with 4 bins → bin = value
    // side0: [0,0,1] (n1=3)  side1: [1,3] (n2=2)
    // per bin |c1·n2−c2·n1|: b0 |2·2−0|=4, b1 |1·2−1·3|=1, b3 |0−1·3|=3
    val df = Seq(("a", 0L, 0), ("a", 0L, 0), ("a", 1L, 0),
      ("a", 1L, 1), ("a", 3L, 1)).toDF("k", "v", "s")
    val (n1, n2, tv) = Drift.tvDrift(df, "k", "v", "s", bins = 4)
      .select("n1", "n2", "tv_num").as[(Long, Long, Long)].head()
    assert((n1, n2, tv) === ((3L, 2L, 8L)))
  }

  test("psiDrift: identical halves score ~0; disjoint supports score high") {
    val same = (0 until 100).flatMap(i =>
      Seq(("a", (i % 10).toLong, 0), ("a", (i % 10).toLong, 1)))
      .toDF("k", "v", "s")
    val psiSame = Drift.psiDrift(same, "k", "v", "s")
      .select("psi").as[Double].head()
    assert(math.abs(psiSame) < 1e-9, s"identical halves: $psiSame")
    val apart = (Seq.fill(40)(0L).map(v => ("a", v, 0)) ++
      Seq.fill(60)(1000L).map(v => ("a", v, 1))).toDF("k", "v", "s")
    val psiApart = Drift.psiDrift(apart, "k", "v", "s")
      .select("psi").as[Double].head()
    assert(psiApart > 0.25, s"disjoint supports must alert: $psiApart")
  }

  test("psiDrift equals the direct smoothed formula on a planted shift") {
    // 4 bins over pooled 0..3 → bin = value; side0 [0,0,1], side1 [1,3]
    val df = Seq(("a", 0L, 0), ("a", 0L, 0), ("a", 1L, 0),
      ("a", 1L, 1), ("a", 3L, 1)).toDF("k", "v", "s")
    val got = Drift.psiDrift(df, "k", "v", "s", bins = 4)
      .select("n1", "n2", "psi").as[(Long, Long, Double)].head()
    val c1 = Map(0 -> 2L, 1 -> 1L); val c2 = Map(1 -> 1L, 3 -> 1L)
    val expect = (0 until 4).map { b =>
      val p = (c1.getOrElse(b, 0L) + 1.0) / (3 + 4)
      val q = (c2.getOrElse(b, 0L) + 1.0) / (2 + 4)
      (p - q) * math.log(p / q)
    }.sum
    assert(got._1 == 3L && got._2 == 2L)
    assert(math.abs(got._3 - BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("readability: hand-computed integer micro pipeline") {
    import graft.scale.TextOps
    // "go. stop now!" → words 3, sentences 2, vowel groups: o,o,o = 3
    val got = TextOps.readability(Seq((1L, "go. stop now!")).toDF("doc_id", "text"))
      .collect().head
    assert(got.getAs[Long]("n_words") == 3L)
    assert(got.getAs[Long]("n_sentences") == 2L)
    assert(got.getAs[Long]("n_syllables") == 3L)
    val wps = 3L * 1000000L / 2L // 1500000
    val spw = 3L * 1000000L / 3L // 1000000
    assert(got.getAs[Long]("flesch_micro") ==
      206835000L - 1015L * wps / 1000L - 84600L * spw / 1000L)
  }

  test("keys bin independently over their own pooled range") {
    val df = Seq(("a", 0L, 0), ("a", 100L, 1),
      ("b", 5L, 0), ("b", 5L, 1)).toDF("k", "v", "s")
    val out = Drift.tvDrift(df, "k", "v", "s")
      .select("k", "tv_num").as[(String, Long)].collect().toMap
    assert(out("a") === 2L) // disjoint singletons: 2·1·1
    assert(out("b") === 0L)
  }
}
