package graft

import org.apache.spark.sql.functions._
import graft.analysis.RangeJoin

/** Binned interval-point range join: boundary inclusivity, multi-bin
  * intervals, key isolation, and equivalence to the naive theta join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive on both ends, exclusive outside") {
    val points = Seq((7L, 99L), (7L, 100L), (7L, 150L), (7L, 200L), (7L, 201L))
      .toDF("k", "t")
    val iv = Seq((7L, 1L, 100L, 200L)).toDF("k", "iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, iv, Seq("k"), "t", "s", "e", 50L)
      .select("t").as[Long].collect().sorted
    assert(out.toSeq == Seq(100L, 150L, 200L))
  }

  test("interval spanning many bins still catches every point") {
    val points = (0L to 1000L by 100).map((7L, _)).toDF("k", "t")
    val iv = Seq((7L, 1L, 50L, 950L)).toDF("k", "iv_id", "s", "e")
    // binWidth much smaller than the interval: 10 bins exploded
    val out = RangeJoin.pointInInterval(points, iv, Seq("k"), "t", "s", "e", 100L)
    assert(out.count() == 9) // 100..900
  }

  test("keys are isolated; each containment appears exactly once") {
    val points = Seq((7L, 150L), (8L, 150L)).toDF("k", "t")
    val iv = Seq((7L, 1L, 100L, 200L), (7L, 2L, 140L, 160L)).toDF("k", "iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, iv, Seq("k"), "t", "s", "e", 1000L)
    // key 8's point matches nothing; key 7's point is in both intervals
    assert(out.count() == 2)
    assert(out.select("iv_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("matches the naive theta join on pseudo-random data") {
    val points = (0 until 300).map(i => ((i * 7 % 5).toLong, (i * 131 % 997).toLong))
      .toDF("k", "t")
    val iv = (0 until 60).map { i =>
      val s = (i * 239 % 900).toLong
      ((i * 3 % 5).toLong, i.toLong, s, s + (i * 17 % 150))
    }.toDF("k", "iv_id", "s", "e")
    val binned = RangeJoin.pointInInterval(points, iv, Seq("k"), "t", "s", "e", 128L)
      .select("k", "t", "iv_id")
    val naive = points.join(iv, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("k", "t", "iv_id")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }
}
