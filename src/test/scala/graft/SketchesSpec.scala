package graft

import org.apache.spark.sql.functions._

import graft.scale.Sketches

/** Sketch semantics: CMS never under-counts (and is exact without
  * collisions), the HLL-style distinct estimate lands near the truth,
  * and both are deterministic (md5-derived hashes, no seed state). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CMS estimates dominate exact counts; tiny vocab has no collisions") {
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, if (i % 2 == 0) "alpha beta" else "alpha gamma"))
      .toDF("doc_id", "text")
    val rows = Sketches.cmsHeavyHitters(docs, k = 3).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("exact_count"), r.getAs[Long]("cms_count")))).toMap
    assert(rows("alpha") == ((50L, 50L)))
    assert(rows("beta") == ((25L, 25L)))
    assert(rows("gamma") == ((25L, 25L)))
    // the inequality that defines the sketch
    assert(rows.values.forall { case (exact, est) => est >= exact })
  }

  test("distinct-count sketch tracks the true cardinality") {
    // one group with 200 distinct tokens, one with 10
    val big = (0 until 200).map(i => s"tok$i").mkString(" ")
    val small = (0 until 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, "big", big), (1L, "small", small))
      .toDF("doc_id", "lang", "text")
    val m = Sketches.hllDistinct(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Double]("hll_estimate")))).toMap
    assert(m("big")._1 == 200L && m("small")._1 == 10L)
    // 64 registers → ~13% standard error; accept 3σ
    assert(math.abs(m("big")._2 - 200.0) / 200.0 < 0.4, m("big").toString)
    assert(m("big")._2 > m("small")._2)
    // determinism: a second run reproduces the estimates exactly
    val again = Sketches.hllDistinct(docs).collect()
      .map(r => r.getAs[Double]("hll_estimate")).sorted
    assert(again.toSeq == m.values.map(_._2).toSeq.sorted)
  }
}
