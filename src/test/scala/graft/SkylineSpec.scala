package graft

import graft.analysis.Skyline

/** Distributed 2-D skyline vs in-memory brute force, including the
  * cross-partition prefix-max handoff. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filter { p =>
      !d.exists(q => q != p && q._1 >= p._1 && q._2 >= p._2)
    }.toSet
  }

  test("hand-checked frontier with duplicates and equal-x columns") {
    //   (5,1) and (5,3): same x, only the higher y survives
    //   (3,3) dominated by (5,3); (1,9) survives on y; dupes collapse
    val pts = Seq((5L, 1L), (5L, 3L), (3L, 3L), (1L, 9L), (1L, 9L), (4L, 2L))
    val got = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 3L), (1L, 9L)))
    assert(got == brute(pts))
  }

  test("matches brute force on a deterministic 400-point cloud") {
    // multiplicative-hash cloud: enough spread that the range sort uses
    // many partitions, exercising the broadcast prefix-max seeding
    val pts = (0 until 400).map { i =>
      val h = (i * 2654435761L) & 0xffffffffL
      ((h % 1000).toLong, ((h / 1000) % 1000).toLong)
    }
    val got = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(pts))
    assert(got.nonEmpty && got.size < 400)
  }

  test("a single point is its own skyline") {
    val got = Skyline.skyline2D(Seq((7L, 7L)).toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((7L, 7L)))
  }
}
