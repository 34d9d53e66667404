package graft

import org.apache.spark.sql.functions._
import graft.scale.{Curation, TextOps}

/** RRF fusion + the linear quality classifier. */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse sums reciprocal ranks and breaks ties by id") {
    val r1 = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "id", "rank")
    val r2 = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("query_id", "id", "rank")
    val out = TextOps.rrfFuse(Seq(r1, r2), k = 3)
      .orderBy(col("rank")).collect()
    // 11: 1/62 + 1/61 (two lists) beats 10: 1/61 (one list, rank 1)
    assert(out.map(_.getLong(2)).toSeq == Seq(11L, 10L, 12L))
    val top = out.head.getDouble(3)
    assert(math.abs(top - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    // a doc absent from one ranking contributes only its present terms
    assert(out(1).getDouble(3) < top)
  }

  test("rrfFuse id tie-break is deterministic on equal scores") {
    val r1 = Seq((0L, 20L, 1), (0L, 10L, 2)).toDF("query_id", "id", "rank")
    val r2 = Seq((0L, 10L, 1), (0L, 20L, 2)).toDF("query_id", "id", "rank")
    val out = TextOps.rrfFuse(Seq(r1, r2), k = 2).orderBy(col("rank")).collect()
    // both score 1/61 + 1/62 -> lower id wins rank 1
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 20L))
  }

  test("logisticQuality: keep iff rounded logit >= 0, p consistent") {
    val docs = Seq(
      (1L, "good clean alphabetic words repeated here " * 10),      // long, alpha
      (2L, "x@#$ 1% !!"),                                           // junky
      (3L, "")).map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    val out = Curation.logisticQuality(docs).orderBy(col("doc_id")).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getInt(3))).toMap
    assert(byId(1L)._3 == 1 && byId(1L)._1 > 0)
    assert(byId(2L)._3 == 0 && byId(2L)._1 < 0)
    out.foreach { r =>
      val (logit, p, keep) = (r.getDouble(1), r.getDouble(2), r.getInt(3))
      assert((logit >= 0) == (keep == 1))
      assert((p >= 0.5) == (keep == 1))
      assert(p > 0.0 && p < 1.0)
    }
  }

  test("rankOverlap counts top-d intersections with explicit zeros") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "id", "rank")
    val b = Seq((1L, 12L, 1), (1L, 13L, 2), (1L, 10L, 3))
      .toDF("query_id", "id", "rank")
    // shared ids: 10 at (1,3), 12 at (3,1) -> both enter at d = 3
    val got = TextOps.rankOverlap(a, b, 3).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1, 0L), (2, 0L), (3, 2L)))
  }
}
